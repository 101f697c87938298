"""Multi-resolution detection: TPU path vs the multires oracle, and the
multires oracle vs the plain oracle on single-resolution models."""

import numpy as np
import pytest

import jax.numpy as jnp

from partsbaseddetector_tpu.models import synthetic
from partsbaseddetector_tpu.oracle import reference as oracle
from partsbaseddetector_tpu.oracle import multires as omr


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def test_multires_oracle_matches_plain_on_ds0(rng):
    """With all ds = 0 the multires oracle is a matlab-mode detector:
    same VALUES as the C++-mode oracle (separable max-transform), for
    every candidate above threshold."""
    m = synthetic.tiny(seed=4)
    m.thresh = 0.2
    im = rng.random((72, 88)) * 255
    a = oracle.sort_candidates(oracle.detect(im, m))
    b = oracle.sort_candidates(omr.detect_multires(im, m))
    assert len(a) == len(b) > 0
    np.testing.assert_allclose([c.score for c in a],
                               [c.score for c in b], atol=1e-9)


def test_multires_schema_helpers():
    m = synthetic.tiny_multires(seed=1)
    assert m.max_scale() == 1
    assert m.part_scales(0) == [0, 1, 1, 1]
    s = synthetic.tiny(seed=1)
    assert s.max_scale() == 0


def test_multires_tpu_matches_oracle(rng):
    from partsbaseddetector_tpu.infer.multires import MultiResDetector

    m = synthetic.tiny_multires(seed=5)
    m.thresh = -1e9
    im = rng.random((80, 96)) * 255

    ref = omr.sort_candidates_scores = sorted(
        omr.detect_multires(im, m), key=lambda c: -c.score)
    det = MultiResDetector(m, k_per_level=8)
    got = det.detect(im)
    assert len(got) > 0 and len(ref) > 0

    # top-k scores must match the oracle's top-k (k small enough that
    # the fixed-capacity extraction keeps all of them)
    n = min(5, len(ref), len(got))
    np.testing.assert_allclose([d.score for d in got[:n]],
                               [c.score for c in ref[:n]], atol=2e-4)
    # the top candidate's part boxes and grid locations must agree
    np.testing.assert_allclose(got[0].parts, ref[0].parts, atol=1.01)
    assert tuple(got[0].locations[0]) == tuple(ref[0].locations[0])


def test_multires_fft_engine_matches_spatial(rng):
    """The stage-2 engine knob on the multires facade (round-4 gap:
    _multires_program hardcoded the spatial engine)."""
    from partsbaseddetector_tpu.infer.multires import MultiResDetector

    m = synthetic.tiny_multires(seed=5)
    m.thresh = -1e9
    im = rng.random((64, 64)) * 255
    a = MultiResDetector(m, k_per_level=8).detect_raw(im)
    b = MultiResDetector(m, k_per_level=8,
                         conv_engine="fft").detect_raw(im)
    np.testing.assert_array_equal(np.asarray(a.valid),
                                  np.asarray(b.valid))
    np.testing.assert_allclose(np.asarray(a.score),
                               np.asarray(b.score), atol=2e-3)
    with pytest.raises(ValueError, match="conv_engine"):
        MultiResDetector(m, conv_engine="wavelet")


def test_multires_tpu_ds0_matches_plain_detector(rng):
    """On a single-resolution model the multires TPU path reproduces the
    standard Detector's values."""
    from partsbaseddetector_tpu.infer.detector import Detector
    from partsbaseddetector_tpu.infer.multires import MultiResDetector

    m = synthetic.tiny(seed=9)
    m.thresh = 0.1
    im = rng.random((64, 72)) * 255
    a = Detector(m, k_per_level=8).detect(im)
    b = MultiResDetector(m, k_per_level=8).detect(im)
    n = min(4, len(a), len(b))
    assert n > 0
    np.testing.assert_allclose([d.score for d in a[:n]],
                               [d.score for d in b[:n]], atol=2e-4)
