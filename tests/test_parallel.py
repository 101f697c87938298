"""Sharded batch detection on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax

from partsbaseddetector_tpu.infer.detector import Detector
from partsbaseddetector_tpu.models import synthetic
from partsbaseddetector_tpu.parallel.mesh import make_mesh
from partsbaseddetector_tpu.parallel.sharded import BatchDetector


@pytest.fixture(scope="module")
def model():
    m = synthetic.tiny(seed=3)
    m.thresh = -1e9
    return m


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4)])
def test_batch_detector_matches_single(model, shape):
    """Sharding over data and/or filter axes must not change results."""
    assert len(jax.devices()) == 8
    mesh = make_mesh(shape)
    bdet = BatchDetector(model, mesh, k_per_level=16)
    det = Detector(model, k_per_level=16)

    rng = np.random.default_rng(0)
    B = shape[0] * 2
    images = (rng.random((B, 64, 64, 3)) * 255).astype(np.float32)
    cands = bdet.detect_batch(images)
    assert cands.score.shape[0] == B
    for b in range(B):
        single = det.detect_raw(images[b])
        np.testing.assert_allclose(np.asarray(cands.score[b]),
                                   np.asarray(single.score), atol=2e-4)
        np.testing.assert_array_equal(np.asarray(cands.valid[b]),
                                      np.asarray(single.valid))
        # box agreement on valid entries
        v = np.asarray(single.valid)
        np.testing.assert_allclose(
            np.asarray(cands.boxes[b])[v],
            np.asarray(single.boxes)[v], atol=1e-3)


def test_batch_detector_rejects_bad_batch(model):
    mesh = make_mesh((8, 1))
    bdet = BatchDetector(model, mesh)
    with pytest.raises(ValueError, match="not divisible"):
        bdet.detect_batch(np.zeros((3, 64, 64, 3), np.float32))


def test_graft_dryrun_runs():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_batch_detector_multires_matches_single():
    """Sharded path serves multi-resolution models (anchor ds > 0)
    through the multires program (round-1 gap: BatchDetector could not
    serve them at all)."""
    from partsbaseddetector_tpu.infer.multires import MultiResDetector

    model = synthetic.tiny_multires(seed=5)
    model.thresh = -1e9
    mesh = make_mesh((4, 2))
    bdet = BatchDetector(model, mesh, k_per_level=8)
    assert bdet.multires
    det = MultiResDetector(model, k_per_level=8)

    rng = np.random.default_rng(2)
    images = (rng.random((4, 64, 64, 3)) * 255).astype(np.float32)
    cands = bdet.detect_batch(images)
    for b in range(4):
        single = det.detect_raw(images[b])
        np.testing.assert_allclose(np.asarray(cands.score[b]),
                                   np.asarray(single.score), atol=2e-4)
        np.testing.assert_array_equal(np.asarray(cands.valid[b]),
                                      np.asarray(single.valid))


@pytest.mark.parametrize("shape", [(8, 1), (4, 2)])
def test_scale_sharded_matches_single(model, shape):
    """Pyramid levels sharded over the scale axis (SURVEY.md §2.4 row 2)
    must reproduce single-device results, including at bucket sizes that
    need level padding."""
    from partsbaseddetector_tpu.parallel.scale_sharded import (
        ScaleShardedDetector, make_scale_mesh)

    mesh = make_scale_mesh(shape)
    sdet = ScaleShardedDetector(model, mesh, k_per_level=16)
    det = Detector(model, k_per_level=16, dp_split=1)

    rng = np.random.default_rng(4)
    im = (rng.random((72, 56, 3)) * 255).astype(np.float32)
    cands = sdet.detect_raw(im)
    single = det.detect_raw(im)

    def entries(c):
        return {(int(l), tuple(map(tuple, x))): float(s)
                for s, v, x, l in zip(np.asarray(c.score),
                                      np.asarray(c.valid),
                                      np.asarray(c.loc),
                                      np.asarray(c.level)) if v}
    got, ref = entries(cands), entries(single)
    assert got.keys() == ref.keys()
    for k in got:
        assert abs(got[k] - ref[k]) < 2e-4


def test_pipelined_detector_matches_single(model):
    """Cross-stage pipeline (stages 1-2 on one device, 3-4 on another)
    must reproduce the single-device program, with both stages actually
    placed on their assigned devices."""
    from partsbaseddetector_tpu.parallel.pipeline import PipelinedDetector

    devs = jax.devices()
    pdet = PipelinedDetector(model, front=devs[0], back=devs[1],
                             k_per_level=16, dp_split=3)
    det = Detector(model, k_per_level=16, dp_split=3)

    rng = np.random.default_rng(6)
    frames = [(rng.random((64, 64, 3)) * 255).astype(np.float32)
              for _ in range(3)]
    outs = list(pdet.stream(frames))
    assert len(outs) == 3
    assert list(outs[0].score.devices()) == [devs[1]]
    for f, cands in zip(frames, outs):
        single = det.detect_raw(f)
        np.testing.assert_allclose(np.asarray(cands.score),
                                   np.asarray(single.score), atol=2e-4)
        np.testing.assert_array_equal(np.asarray(cands.valid),
                                      np.asarray(single.valid))
        np.testing.assert_array_equal(np.asarray(cands.loc),
                                      np.asarray(single.loc))
