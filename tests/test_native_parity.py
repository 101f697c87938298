"""Cross-ENGINE parity: the JAX detector vs the native C++/OpenMP engine.

Round 1's parity evidence all compared the JAX path against the NumPy
oracle — same author, correlated-error risk.  This test is the
independent check: native/pbd_native.cpp implements the reference's
pipeline with the reference's algorithm structure (envelope distance
transform include/DistanceTransform.hpp:152-244, DP + argmin
src/DynamicProgram.cpp:66-255), compiled by g++, driven through ctypes;
the JAX detector implements a TPU-first redesign (dense max-plus DT,
argmax-free scan, K-point backtracking).  Agreement of the two candidate
sets on a full-pyramid person-26 workload is the acceptance contract
(PCK form, matlab/evaluation/eval_pck.m:8-13).
"""

import numpy as np
import pytest

from partsbaseddetector_tpu.infer.detector import Detector
from partsbaseddetector_tpu.models import synthetic

K_PER_LEVEL = 8
IMSHAPE = (240, 320)


@pytest.fixture(scope="module")
def native_engine():
    from partsbaseddetector_tpu import native_engine as ne
    try:
        return ne.NativeEngine()
    except (RuntimeError, OSError) as e:     # no toolchain in this env
        pytest.skip(f"native engine unavailable: {e}")


@pytest.fixture(scope="module", params=["person26", "face68"])
def model(request):
    if request.param == "person26":
        # person-26 shape (conf/config_person.by_parts:30): 26 parts,
        # 4 mixtures/part (uniform, incl. root, for the dense native
        # layout), 5x5x32 filters, interval 10 -> full 29-scale pyramid
        # at 320x240
        m = synthetic.make_model(name="person26_uniform", nparts=26,
                                 nmixtures=4, root_nmixtures=4,
                                 filter_size=5, flen=32, norient=18,
                                 binsize=4, interval=10, seed=21)
    else:
        # face-68 shape (conf/config_face.by_parts:31): 68 parts,
        # 272-filter bank, interval 5 — stresses K, the bank size and
        # the DP scan length (2.6x the parts of person-26)
        m = synthetic.face_like(seed=22)
    m.thresh = -1e9          # rank by top-k, not threshold
    return m


def structured_image(seed: int, h: int = IMSHAPE[0],
                     w: int = IMSHAPE[1]) -> np.ndarray:
    """Deterministic image with real gradient structure (edges at many
    orientations + texture), not pure noise."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w, 3))
    img[..., 0] = 80 + 60 * np.sin(2 * np.pi * xx / 37.0)
    img[..., 1] = 80 + 60 * np.cos(2 * np.pi * (xx + 2 * yy) / 53.0)
    img[..., 2] = 90 + 50 * np.sin(2 * np.pi * (yy - xx) / 41.0)
    for _ in range(12):               # bright rectangles, random aspect
        y0, x0 = rng.integers(0, h - 40), rng.integers(0, w - 40)
        hh, ww = rng.integers(12, 60), rng.integers(12, 60)
        img[y0:y0 + hh, x0:x0 + ww] += rng.uniform(30, 90, size=3)
    for _ in range(6):                # dark disks
        cy, cx = rng.integers(20, h - 20), rng.integers(20, w - 20)
        r = rng.integers(8, 24)
        mask = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
        img[mask] *= 0.4
    img += rng.normal(0, 4.0, size=img.shape)
    return np.clip(img, 0, 255)


def _by_level(cands):
    out = {}
    for c in cands:
        out.setdefault(c.level, []).append(c)
    return out


@pytest.mark.parametrize("seed", [101, 202])
def test_cross_engine_candidates(native_engine, model, seed):
    if model.name == "face_like" and seed != 101:
        pytest.skip("one seed suffices for the face-68 topology "
                    "(runtime; person-26 covers seed variation)")
    img = structured_image(seed)

    native = native_engine.detect(img, model, k_per_level=K_PER_LEVEL)
    det = Detector(model, k_per_level=K_PER_LEVEL, dp_split=1)
    jax_dets = det.detect(img)

    nat_lv = _by_level(native)
    jax_lv = _by_level(jax_dets)
    nscales = native_engine.nscales(*IMSHAPE, model.binsize,
                                    model.interval)
    assert sorted(nat_lv) == sorted(jax_lv) == list(range(nscales))

    total_keys = matched_keys = 0
    exact_parts = close_parts = total_parts = 0
    score_diffs = []
    for lvl in range(nscales):
        nat = {(int(c.loc[0, 0]), int(c.loc[0, 1])): c
               for c in nat_lv[lvl]}
        jx = {(int(d.locations[0, 0]), int(d.locations[0, 1])): d
              for d in jax_lv[lvl]}
        assert len(nat) == len(jx) == min(
            K_PER_LEVEL, len(nat) or K_PER_LEVEL)
        common = set(nat) & set(jx)
        total_keys += K_PER_LEVEL
        matched_keys += len(common)
        for key in common:
            c, d = nat[key], jx[key]
            score_diffs.append(abs(c.score - d.score))
            dd = np.abs(c.loc[:, :2] - d.locations[:, :2])
            total_parts += c.loc.shape[0]
            exact_parts += int(((dd == 0).all(axis=1) &
                                (c.loc[:, 2] == d.locations[:, 2])).sum())
            close_parts += int((dd.max(axis=1) <= 1).sum())

    # top-k root sets agree per level up to float-boundary churn
    assert matched_keys >= 0.9 * total_keys, \
        f"root top-k agreement {matched_keys}/{total_keys}"
    # scores on matched candidates agree to float tolerance for the
    # overwhelming majority; rare outliers are discontinuous HOG
    # orientation-snap flips on near-tied gradients (src/HOGFeatures.
    # cpp:242-249 argmax), where a ~1e-7 resize difference legitimately
    # moves a whole histogram contribution between channels
    diffs = np.asarray(score_diffs)
    assert np.median(diffs) < 1e-4
    assert (diffs < 1e-3).mean() >= 0.9, \
        f"only {(diffs < 1e-3).mean():.3f} of scores within 1e-3"
    # PCK(1 cell) across all matched candidates ~ 1.0; most parts exact
    assert close_parts >= 0.99 * total_parts, \
        f"PCK {close_parts}/{total_parts}"
    assert exact_parts >= 0.9 * total_parts, \
        f"exact parts {exact_parts}/{total_parts}"
