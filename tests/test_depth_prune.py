"""Depth-based response pruning wired into the detector.

The reference declares detect(im, depth, candidates)
(include/PartsBasedDetector.hpp:172-174) but leaves the
filterResponseByDepth call commented out
(src/PartsBasedDetector.cpp:86) and its body abandoned after computing
the plausible depth (src/SearchSpacePruning.cpp:59-69).  Here the
pruning is realized: stage-2 responses at implausible depths are masked
to NEG before the DP.
"""

import numpy as np
import pytest

from partsbaseddetector_tpu.infer.detector import DepthPrune, Detector
from partsbaseddetector_tpu.models import synthetic

CFG = DepthPrune(part_width_m=0.2, fx=400.0, tol=0.3)


@pytest.fixture(scope="module")
def setup():
    model = synthetic.tiny(seed=3)
    model.thresh = -1e5
    rng = np.random.default_rng(17)
    im = rng.random((64, 64, 3)) * 255
    det = Detector(model, k_per_level=8, depth_prune=CFG)
    return model, im, det


def _keys(dets):
    return {(d.level, int(d.locations[0, 0]), int(d.locations[0, 1]))
            for d in dets}


def test_zero_depth_means_unknown(setup):
    """depth == 0 cells are never pruned (the reference's median/depth
    guards treat 0 as missing, src/SearchSpacePruning.cpp:88)."""
    model, im, det = setup
    base = det.detect(im)
    assert base
    same = det.detect(im, depth=np.zeros(im.shape[:2], np.float32))
    assert _keys(same) == _keys(base)
    np.testing.assert_allclose(
        sorted(d.score for d in same), sorted(d.score for d in base),
        atol=1e-6)


def test_implausible_depth_prunes_everything(setup):
    """A constant depth far from every level's plausible depth masks all
    responses -> no candidate survives the threshold."""
    model, im, det = setup
    far = np.full(im.shape[:2], 500.0, np.float32)
    assert det.detect(im, depth=far) == []


def test_plausible_depth_keeps_matching_levels(setup):
    """Depth equal to level-L's plausible depth keeps candidates at
    levels whose scale is within tol of it and prunes the rest."""
    model, im, det = setup
    plan = det.plan_for(im.shape[:2])
    scales = [lvl.scale for b in plan.buckets for lvl in b.levels]
    ztarget = CFG.fx * CFG.part_width_m / scales[len(scales) // 2]
    depth = np.full(im.shape[:2], ztarget, np.float32)
    dets = det.detect(im, depth=depth)
    assert dets
    plausible = {i for i, s in enumerate(scales)
                 if abs(ztarget - CFG.fx * CFG.part_width_m / s)
                 <= CFG.tol * CFG.fx * CFG.part_width_m / s}
    got_levels = {d.level for d in dets}
    assert got_levels <= plausible
    # and the surviving candidates match the unpruned run at those levels
    base = {k for k in _keys(det.detect(im)) if k[0] in plausible}
    assert _keys(dets) == base


def test_no_depth_no_config_paths_agree(setup):
    """Without a depth map the depth-configured detector runs the plain
    program (no extra compile, no behavior change)."""
    model, im, det = setup
    plain = Detector(model, k_per_level=8)
    assert _keys(det.detect(im)) == _keys(plain.detect(im))


def test_multires_depth_prune_all_paths():
    """Depth pruning works for multi-resolution models on the single-
    chip, batch-sharded and scale-sharded paths (capability-matrix
    uniformity); masked search on multires stays an explicit error."""
    import jax

    from partsbaseddetector_tpu.infer.multires import MultiResDetector
    from partsbaseddetector_tpu.parallel.mesh import make_mesh
    from partsbaseddetector_tpu.parallel.scale_sharded import (
        ScaleShardedDetector, make_scale_mesh)
    from partsbaseddetector_tpu.parallel.sharded import BatchDetector

    model = synthetic.tiny_multires(seed=5)
    model.thresh = -1e5
    rng = np.random.default_rng(4)
    im = (rng.random((64, 64, 3)) * 255).astype(np.float32)
    far = np.full((64, 64), 500.0, np.float32)
    zero = np.zeros((64, 64), np.float32)

    det = MultiResDetector(model, k_per_level=8, depth_prune=CFG)
    base = det.detect_raw(im)
    assert np.asarray(base.valid).any()
    # zero depth = unknown: identical; far depth: everything pruned
    same = det.detect_raw(im, depth=zero)
    np.testing.assert_array_equal(np.asarray(same.valid),
                                  np.asarray(base.valid))
    assert not np.asarray(det.detect_raw(im, depth=far).valid).any()

    bdet = BatchDetector(model, make_mesh((4, 2)), k_per_level=8,
                         depth_prune=CFG)
    cands = bdet.detect_batch(np.stack([im] * 4),
                              depths=np.stack([zero, far, zero, far]))
    np.testing.assert_array_equal(np.asarray(cands.valid[0]),
                                  np.asarray(base.valid))
    assert not np.asarray(cands.valid[1]).any()
    # masked multires on the sharded paths now works — covered by
    # tests/test_multires_masked.py::test_masked_multires_sharded_paths

    sdet = ScaleShardedDetector(model, make_scale_mesh((8, 1)),
                                k_per_level=8, depth_prune=CFG)
    sc = sdet.detect_raw(im, depth=zero)
    np.testing.assert_array_equal(np.asarray(sc.valid),
                                  np.asarray(base.valid))
    assert not np.asarray(sdet.detect_raw(im, depth=far).valid).any()
