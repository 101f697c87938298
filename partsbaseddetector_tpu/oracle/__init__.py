"""NumPy oracle: a faithful, slow re-implementation of the reference
detector's math, used as the golden source for unit/parity tests."""

from partsbaseddetector_tpu.oracle.reference import (  # noqa: F401
    OracleCandidate, conv_bank, detect, distance_transform, dp_argmin,
    dp_min, hog_features, pyr_down, pyramid, resize_linear)
