"""Fused Pallas backtracking walk vs the XLA gather walk.

The kernel (ops/walk_pallas.py) must be BIT-IDENTICAL to the unrolled
XLA path (ops/dp.walk_children): one-hot MXU dots at highest precision
reproduce gathers exactly, and argmax tie-breaking is first-wins in
both.  On CPU the kernel runs in interpreter mode (same semantics as
the Mosaic compile)."""

import numpy as np
import pytest

from partsbaseddetector_tpu.infer.detector import Detector
from partsbaseddetector_tpu.models import synthetic


def _assert_identical(a, b):
    for name in ("score", "valid", "loc", "boxes", "level",
                 "component"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            err_msg=f"field {name} diverges")


@pytest.mark.parametrize("compose", ["reference", "correct"])
def test_walk_pallas_matches_xla(compose):
    model = synthetic.tiny(seed=3)
    model.thresh = -1e9
    rng = np.random.default_rng(7)
    im = rng.random((64, 80, 3)) * 255

    dx = Detector(model, k_per_level=8, compose=compose, dp_split=2)
    dp = Detector(model, k_per_level=8, compose=compose, dp_split=2,
                  walk_impl="pallas_interpret")
    _assert_identical(dx.detect_raw(im), dp.detect_raw(im))


def test_walk_pallas_single_part_and_auto():
    # single-part models short-circuit (no walk to fuse)
    from partsbaseddetector_tpu.train.trainer import _single_filter_model

    m1 = _single_filter_model(np.random.default_rng(0)
                              .standard_normal((3, 3, 14)) * 0.05,
                              0.0, 4, 6, 14, -1e9)
    dx = Detector(m1, k_per_level=4)
    dp = Detector(m1, k_per_level=4, walk_impl="pallas_interpret")
    im = np.random.default_rng(1).random((48, 48, 3)) * 255
    _assert_identical(dx.detect_raw(im), dp.detect_raw(im))

    # auto resolves to the XLA walk off-TPU (conftest forces CPU)
    assert Detector(m1).walk_impl == "xla"
    with pytest.raises(ValueError, match="walk_impl"):
        Detector(m1, walk_impl="cuda")
