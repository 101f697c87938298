"""Oracle self-consistency and cross-validation tests.

The oracle is the golden model for the JAX kernels, so it must itself be
validated: image ops against OpenCV (same algorithms, float path), the DT
envelope against brute-force evaluation, conv against scipy, and the DP via
the score-reconstruction invariant the reference uses
(matlab/detection/detect.m:137-142)."""

import numpy as np
import pytest

from partsbaseddetector_tpu.models import synthetic
from partsbaseddetector_tpu.oracle import reference as oracle

try:
    import cv2
    HAVE_CV2 = True
except ImportError:  # pragma: no cover
    HAVE_CV2 = False


# ------------------------------------------------------------------ resize

@pytest.mark.skipif(not HAVE_CV2, reason="cv2 unavailable")
@pytest.mark.parametrize("shape,dsize", [
    ((64, 48), (40, 30)), ((63, 47), (41, 29)), ((32, 32), (20, 20)),
    ((30, 50, 3), (19, 33)),
])
def test_resize_matches_opencv_float(rng, shape, dsize):
    im = rng.random(shape).astype(np.float64)
    ours = oracle.resize_linear(im, dsize)
    theirs = cv2.resize(im, (dsize[1], dsize[0]),
                        interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours, np.atleast_3d(theirs).reshape(ours.shape)
                               if im.ndim == 3 else theirs, atol=1e-10)


@pytest.mark.skipif(not HAVE_CV2, reason="cv2 unavailable")
@pytest.mark.parametrize("shape", [(64, 48), (63, 47), (33, 45, 3)])
def test_pyrdown_matches_opencv_float(rng, shape):
    im = rng.random(shape).astype(np.float64)
    ours = oracle.pyr_down(im)
    theirs = cv2.pyrDown(im)
    np.testing.assert_allclose(
        ours.reshape(theirs.shape), theirs, atol=1e-10)


# ------------------------------------------------------------------ conv

def test_conv_bank_matches_scipy(rng):
    from scipy.ndimage import correlate
    H, W, C = 17, 13, 5
    feat = rng.standard_normal((H, W, C))
    filters = [rng.standard_normal((kh, kw, C))
               for kh, kw in [(3, 3), (5, 5), (4, 6)]]
    ours = oracle.conv_bank(feat, filters)
    for K, r in zip(filters, ours):
        acc = np.zeros((H, W))
        for c in range(C):
            cval = 1.0 if c == C - 1 else 0.0
            acc += correlate(feat[..., c], K[..., c], mode="constant",
                             cval=cval)
        np.testing.assert_allclose(r, acc, atol=1e-10)


def test_conv_bank_occlusion_border():
    """The one-padded last channel must raise border responses by the sum
    of the out-of-image truncation weights
    (reference: src/SpatialConvolutionEngine.cpp:146-157)."""
    H = W = 9
    C = 2
    feat = np.zeros((H, W, C))
    K = np.zeros((3, 3, C))
    K[..., 1] = 1.0  # truncation channel weights all ones
    (r,) = oracle.conv_bank(feat, [K])
    assert r[0, 0] == 5.0   # corner: 5 of 9 taps outside
    assert r[0, 4] == 3.0   # edge: one row outside
    assert r[4, 4] == 0.0   # interior: no padding seen


# ------------------------------------------------------------------ DT

@pytest.mark.parametrize("shape,anchor", [
    ((13, 13), (0, 0)), ((9, 14), (2, -3)), ((20, 7), (-5, 4)),
])
def test_dt_envelope_matches_bruteforce(rng, shape, anchor):
    score = rng.standard_normal(shape) * 3
    w = [0.1, -0.02, 0.07, 0.01]
    for compose in ("reference",):
        s1, ix1, iy1 = oracle.distance_transform(score, w, anchor, compose)
        s2, ix2, iy2 = oracle.distance_transform_bruteforce(score, w, anchor)
        np.testing.assert_allclose(s1, s2, atol=1e-9)
        np.testing.assert_array_equal(ix1, ix2)
        np.testing.assert_array_equal(iy1, iy2)


def test_dt_argmax_achieves_max(rng):
    """With compose='correct', (Ix, Iy) must achieve score_out exactly."""
    M, N = 11, 15
    score = rng.standard_normal((M, N)) * 2
    w = [0.12, 0.03, 0.05, -0.04]
    ax, ay = 1, -2
    out, Ix, Iy = oracle.distance_transform(score, w, (ax, ay), "correct")
    for py in range(M):
        for px in range(N):
            cx, cy = Ix[py, px], Iy[py, px]
            dx = (px + ax) - cx
            dy = (py + ay) - cy
            val = (score[cy, cx] - w[0] * dx * dx - w[1] * dx
                   - w[2] * dy * dy - w[3] * dy)
            assert abs(val - out[py, px]) < 1e-9, (py, px)


def test_dt_reference_compose_differs_from_correct(rng):
    """Documents the reference's argmin-composition quirk
    (include/DistanceTransform.hpp:233-244): tables differ from the
    textbook composition (scores are identical)."""
    score = rng.standard_normal((12, 12)) * 3
    w = [0.3, 0.0, 0.3, 0.0]
    s_ref, ix_r, iy_r = oracle.distance_transform(score, w, (0, 0),
                                                  "reference")
    s_ok, ix_c, iy_c = oracle.distance_transform(score, w, (0, 0), "correct")
    np.testing.assert_allclose(s_ref, s_ok, atol=1e-9)
    assert (ix_r != ix_c).any() or (iy_r != iy_c).any()


# ------------------------------------------------------------------ DP

def _score_reconstruction(model, c, cand, pdfs):
    """Recompute the root score from backtracked part locations: unary
    filter responses + deformation penalties + pairwise biases + root bias
    (the invariant asserted at matlab/detection/detect.m:137-142)."""
    comp = model.components[c]
    total = float(model.biasw[comp.parts[0].biasid[0]])
    for p in range(comp.nparts):
        part = comp.parts[p]
        x, y, m = cand.locations[p]
        total += pdfs[part.filterid[m]][y, x]
        if p > 0:
            px, py, _ = cand.locations[part.parentid]
            w = model.defw[part.defid[m]]
            ax, ay = model.anchors[part.defid[m]]
            mp = cand.locations[part.parentid][2]
            total += oracle._bias_entry(model, c, p, m, mp)
            dx = (px + ax) - x
            dy = (py + ay) - y
            total += (-w[0] * dx * dx - w[1] * dx
                      - w[2] * dy * dy - w[3] * dy)
    return total


def _tiny_detect_setup(seed=5):
    model = synthetic.tiny(seed=seed)
    rng = np.random.default_rng(seed)
    feat = rng.standard_normal((14, 17, model.flen)) * 0.5
    pdfs = oracle.conv_bank(feat, model.filters)
    return model, pdfs


def test_dp_score_reconstruction_correct_compose():
    model, pdfs = _tiny_detect_setup()
    rootv, rooti, Ix, Iy, Ik = oracle.dp_min(model, 0, pdfs, "correct")
    cands = oracle.dp_argmin(model, 0, rootv, rooti, 4.0, 0, Ix, Iy, Ik)
    assert len(cands) > 0
    for cand in cands[:20]:
        rec = _score_reconstruction(model, 0, cand, pdfs)
        assert abs(rec - cand.score) < 1e-6, (rec, cand.score)


def test_dp_reference_compose_scores_match_correct():
    """Root score maps are identical across compose modes (the quirk only
    scrambles backtracking tables)."""
    model, pdfs = _tiny_detect_setup()
    rootv_r, _, _, _, _ = oracle.dp_min(model, 0, pdfs, "reference")
    rootv_c, _, _, _, _ = oracle.dp_min(model, 0, pdfs, "correct")
    np.testing.assert_allclose(rootv_r, rootv_c, atol=1e-9)


def test_dp_reference_reconstruction_is_lower_bound():
    """With the reference compose, backtracked locations score <= rootv
    (any assignment is dominated by the max)."""
    model, pdfs = _tiny_detect_setup()
    rootv, rooti, Ix, Iy, Ik = oracle.dp_min(model, 0, pdfs, "reference")
    cands = oracle.dp_argmin(model, 0, rootv, rooti, 4.0, 0, Ix, Iy, Ik)
    for cand in cands[:20]:
        rec = _score_reconstruction(model, 0, cand, pdfs)
        assert rec <= cand.score + 1e-6


# ------------------------------------------------------------------ HOG

def test_hog_shapes_and_truncation(rng):
    im = rng.random((40, 52, 3)) * 255
    feat = oracle.hog_features(im, binsize=4, norient=18, flen=32)
    assert feat.shape == (8, 11, 32)
    np.testing.assert_array_equal(feat[..., 31], 0.0)
    assert (feat[..., :31] >= 0).all()
    assert feat.max() > 0


def test_hog_clipping_bound(rng):
    im = rng.random((32, 32)) * 255
    feat = oracle.hog_features(im, binsize=4, norient=18, flen=32)
    # each of the 27 histogram channels is 0.5 * sum of 4 values clipped
    # at 0.2 (reference: src/HOGFeatures.cpp:307-311) -> bound 0.4
    assert feat[..., :27].max() <= 0.4 + 1e-12


def test_hog_rotation_consistency():
    """A vertical-edge image activates horizontal-gradient orientations."""
    im = np.zeros((32, 32))
    im[:, 16:] = 255.0
    feat = oracle.hog_features(im, binsize=4, norient=18, flen=32)
    # orientation 0 = (dx, dy) ~ (1, 0): gradient across vertical edge
    col = feat[:, 2, :]    # cells containing the edge
    assert col[:, 0].sum() > 0
    assert col[:, 4].sum() == 0


# ------------------------------------------------------------------ pyramid

def test_pyramid_ladder_structure(rng):
    im = rng.random((96, 128, 3))
    interval = 5
    images, scales = oracle.pyramid(im, binsize=4, interval=interval)
    nscales, sfactor = oracle.pyramid_scales((96, 128), 4, interval)
    assert len(images) == nscales
    for i in range(len(scales)):
        np.testing.assert_allclose(scales[i], sfactor ** i * 4, rtol=1e-6)
        if i >= interval:
            # octave relation: pyrDown halves (ceil) the finer level
            fh, fw = images[i - interval].shape[:2]
            assert images[i].shape[:2] == ((fh + 1) // 2, (fw + 1) // 2)


def test_end_to_end_oracle_detect_runs():
    model = synthetic.tiny(seed=3)
    model.thresh = 1e9   # intentionally high: no candidates
    rng = np.random.default_rng(0)
    im = rng.random((80, 80)) * 255
    cands = oracle.detect(im, model)
    assert cands == []
