"""End-to-end parity: JAX Detector vs the NumPy oracle pipeline."""

import numpy as np
import pytest

from partsbaseddetector_tpu.infer.detector import Detector
from partsbaseddetector_tpu.models import synthetic
from partsbaseddetector_tpu.oracle import reference as oracle


def _match_candidates(dets, ref_cands):
    """Match by (level, root x, root y); returns (n_matched_exact,
    n_total_ref)."""
    got = {}
    for d in dets:
        key = (d.level, int(d.locations[0, 0]), int(d.locations[0, 1]),
               d.component)
        got[key] = d
    exact = 0
    missing = 0
    for rc in ref_cands:
        key = (rc.scale_index, int(rc.locations[0, 0]),
               int(rc.locations[0, 1]), rc.component)
        if key not in got:
            missing += 1
            continue
        d = got[key]
        assert abs(d.score - rc.score) < 5e-4
        if (d.locations == rc.locations).all():
            np.testing.assert_array_equal(
                d.parts.astype(np.int64), rc.parts)
            exact += 1
    return exact, missing, len(ref_cands)


@pytest.mark.parametrize("imshape", [(80, 60), (64, 96, 3)])
def test_detector_matches_oracle(imshape):
    model = synthetic.tiny(seed=3)
    rng = np.random.default_rng(7)
    im = rng.random(imshape) * 255

    ref_all = oracle.detect(im, model)
    # set the threshold so a handful of candidates fire per level
    scores = np.array([c.score for c in ref_all])
    model.thresh = float(np.quantile(scores, 0.999))
    ref = [c for c in ref_all if c.score > model.thresh]
    assert 1 <= len(ref) < 64

    det = Detector(model, k_per_level=64)
    dets = det.detect(im)

    exact, missing, total = _match_candidates(dets, ref)
    assert missing == 0, f"{missing}/{total} oracle candidates not found"
    assert exact >= int(0.9 * total)
    # no spurious detections beyond tolerance: counts should agree
    assert abs(len(dets) - total) <= max(1, int(0.1 * total))


def test_detector_capacity_overflow_safe():
    """If more candidates exceed threshold than k_per_level, the top ones
    must still be exact."""
    model = synthetic.tiny(seed=3)
    rng = np.random.default_rng(8)
    im = rng.random((64, 64)) * 255
    ref_all = oracle.sort_candidates(oracle.detect(im, model))
    model.thresh = float(np.quantile(
        np.array([c.score for c in ref_all]), 0.5))  # many above
    det = Detector(model, k_per_level=8)
    dets = det.detect(im)
    # top-of-list agreement on root positions per level
    ref_by_level = {}
    for rc in ref_all:
        if rc.score > model.thresh:
            ref_by_level.setdefault(rc.scale_index, []).append(rc)
    for lvl, refs in ref_by_level.items():
        refs = sorted(refs, key=lambda c: -c.score)[:3]
        got = [d for d in dets if d.level == lvl]
        gkeys = {(int(d.locations[0, 0]), int(d.locations[0, 1]))
                 for d in got}
        for rc in refs:
            assert (int(rc.locations[0, 0]),
                    int(rc.locations[0, 1])) in gkeys


def test_detector_sorted_descending():
    model = synthetic.tiny(seed=4)
    model.thresh = -1e9
    rng = np.random.default_rng(9)
    im = rng.random((64, 64)) * 255
    det = Detector(model, k_per_level=16)
    dets = det.detect(im)
    scores = [d.score for d in dets]
    assert scores == sorted(scores, reverse=True)
    assert len(dets) > 0


def test_detect_batch_matches_single():
    """detect_batch_raw (one dispatch for B frames) must reproduce
    detect_raw frame by frame."""
    model = synthetic.tiny(seed=5)
    model.thresh = -1e9
    rng = np.random.default_rng(11)
    ims = rng.random((3, 64, 64, 3)).astype(np.float32) * 255
    det = Detector(model, k_per_level=8)
    batched = det.detect_batch_raw(ims)
    for i in range(ims.shape[0]):
        single = det.detect_raw(ims[i])
        # vmap may change conv/DT reduction order (5e-4 is the repo-wide
        # float parity tolerance), and sort_candidates orders by score,
        # so near-tied candidates can swap positions between the two
        # runs — compare the candidate SETS, not positions
        def entries(c, j=None):
            score = np.asarray(c.score if j is None else c.score[j])
            valid = np.asarray(c.valid if j is None else c.valid[j])
            loc = np.asarray(c.loc if j is None else c.loc[j])
            lvl = np.asarray(c.level if j is None else c.level[j])
            return {(int(l), tuple(map(tuple, x))): float(s)
                    for s, v, x, l in zip(score, valid, loc, lvl) if v}
        be, se = entries(batched, i), entries(single)
        assert be.keys() == se.keys()
        for k in be:
            assert abs(be[k] - se[k]) < 5e-4


def test_conv_engine_fft_matches_spatial():
    """The facade-level engine knob (the reference's engine wiring,
    src/PartsBasedDetector.cpp:108-118): the FFT engine must reproduce
    the spatial engine's candidates to float tolerance end to end."""
    model = synthetic.tiny(seed=3)
    model.thresh = -1e9
    rng = np.random.default_rng(9)
    im = rng.random((64, 64, 3)) * 255

    ds = Detector(model, k_per_level=8, conv_engine="spatial")
    df = Detector(model, k_per_level=8, conv_engine="fft")
    cs = ds.detect_raw(im)
    cf = df.detect_raw(im)
    np.testing.assert_array_equal(np.asarray(cs.valid),
                                  np.asarray(cf.valid))
    np.testing.assert_allclose(np.asarray(cs.score),
                               np.asarray(cf.score), atol=2e-3)
    # top detections land at identical positions (ties aside, the
    # float-tolerance responses pick the same argmaxes at the top)
    v = np.asarray(cs.valid)
    agree = (np.asarray(cs.loc)[v][:4] == np.asarray(cf.loc)[v][:4])
    assert agree.all()

    with pytest.raises(ValueError, match="conv_engine"):
        Detector(model, conv_engine="wavelet")


def test_detector_from_config():
    from partsbaseddetector_tpu.config import RuntimeConfig

    model = synthetic.tiny(seed=3)
    cfg = RuntimeConfig(k_per_level=8, conv_engine="fft", dp_split=2)
    det = Detector.from_config(model, cfg)
    assert det.k_per_level == 8
    assert det.conv_engine == "fft"
    assert det.dp_split == 2
