"""AOT executable cache: deterministic serving cold-start
(infer/aot.py).  The reference's cold start is zero (a C++ binary);
the AOT cache makes the TPU detector's restart a load-from-disk of the
serialized compiled executable instead of an XLA compile."""

import numpy as np
import pytest

from partsbaseddetector_tpu.infer.detector import Detector
from partsbaseddetector_tpu.models import synthetic


@pytest.fixture()
def setup(tmp_path):
    model = synthetic.tiny(seed=3)
    model.thresh = -1e9
    im = (np.random.default_rng(0).random((64, 64, 3)) * 255
          ).astype(np.float32)
    return model, im, str(tmp_path)


def _entries(c):
    return {(int(l), tuple(map(tuple, x))): float(s)
            for s, v, x, l in zip(np.asarray(c.score),
                                  np.asarray(c.valid),
                                  np.asarray(c.loc),
                                  np.asarray(c.level)) if v}


def test_aot_roundtrip_bit_identical(setup):
    model, im, aot_dir = setup

    det1 = Detector(model, k_per_level=8, aot_dir=aot_dir)
    out1 = det1.detect_raw(im)
    assert len(det1.aot_stats) == 1
    assert not det1.aot_stats[0].hit          # cold: compiled + saved

    # a fresh detector (fresh process stand-in) loads the executable
    det2 = Detector(model, k_per_level=8, aot_dir=aot_dir)
    out2 = det2.detect_raw(im)
    assert len(det2.aot_stats) == 1
    assert det2.aot_stats[0].hit, "expected AOT cache hit"
    np.testing.assert_array_equal(np.asarray(out1.score),
                                  np.asarray(out2.score))
    np.testing.assert_array_equal(np.asarray(out1.loc),
                                  np.asarray(out2.loc))

    # and matches the plain jit path exactly
    det3 = Detector(model, k_per_level=8)
    out3 = det3.detect_raw(im)
    assert _entries(out2) == _entries(out3)


def test_aot_weight_independence(setup):
    """Executables are weight-independent (weights are traced args):
    update_model reuses the loaded executable, same as the jit path's
    no-recompile contract."""
    import copy

    model, im, aot_dir = setup
    det = Detector(model, k_per_level=8, aot_dir=aot_dir)
    det.detect_raw(im)

    # same structure (tree/shapes/static config), different weights
    model2 = copy.deepcopy(model)
    rng = np.random.default_rng(9)
    model2.filters = [f + rng.normal(0, 0.02, f.shape)
                      for f in model2.filters]
    model2.biasw = model2.biasw + rng.normal(0, 0.05, model2.biasw.shape)
    det2 = Detector(model2, k_per_level=8, aot_dir=aot_dir)
    out = det2.detect_raw(im)                 # hits det's artifact
    assert det2.aot_stats[0].hit
    ref = Detector(model2, k_per_level=8).detect_raw(im)
    assert _entries(out) == _entries(ref)


def test_aot_batch_and_config_keying(setup):
    model, im, aot_dir = setup
    ims = np.stack([im, im[:, :, ::-1]])

    det = Detector(model, k_per_level=8, aot_dir=aot_dir)
    outb = det.detect_batch_raw(ims)
    assert not det.aot_stats[0].hit

    det2 = Detector(model, k_per_level=8, aot_dir=aot_dir)
    outb2 = det2.detect_batch_raw(ims)
    assert det2.aot_stats[0].hit
    np.testing.assert_array_equal(np.asarray(outb.score),
                                  np.asarray(outb2.score))

    # a different config must MISS (would be a wrong-program bug
    # otherwise)
    det3 = Detector(model, k_per_level=4, aot_dir=aot_dir)
    det3.detect_batch_raw(ims)
    assert not det3.aot_stats[0].hit


def test_aot_depth_variant(setup):
    """The depth-pruned serving path also AOT-caches (and keys apart
    from the plain program)."""
    from partsbaseddetector_tpu.infer.detector import DepthPrune

    model, im, aot_dir = setup
    prune = DepthPrune(part_width_m=0.3, fx=500.0, tol=0.5)
    depth = np.zeros(im.shape[:2], np.float32)   # unknown: never pruned

    d1 = Detector(model, k_per_level=8, depth_prune=prune,
                  aot_dir=aot_dir)
    out1 = d1.detect_raw(im, depth=depth)
    assert not d1.aot_stats[0].hit

    d2 = Detector(model, k_per_level=8, depth_prune=prune,
                  aot_dir=aot_dir)
    out2 = d2.detect_raw(im, depth=depth)
    assert d2.aot_stats[0].hit
    np.testing.assert_array_equal(np.asarray(out1.score),
                                  np.asarray(out2.score))
    ref = Detector(model, k_per_level=8,
                   depth_prune=prune).detect_raw(im, depth=depth)
    assert _entries(out2) == _entries(ref)


def test_aot_sharded_batch(setup):
    """AOT restart of the SHARDED serving program: the SPMD executable
    (data x filter mesh) serializes and a fresh BatchDetector loads it,
    reproducing the jit path exactly."""
    import jax

    from partsbaseddetector_tpu.parallel.mesh import make_mesh
    from partsbaseddetector_tpu.parallel.sharded import BatchDetector

    model, im, aot_dir = setup
    ims = np.stack([im] * 4)
    mesh = make_mesh((2, 2), devices=jax.devices()[:4])

    b1 = BatchDetector(model, mesh, k_per_level=8, dp_split=1,
                       aot_dir=aot_dir)
    out1 = b1.detect_batch(ims)
    assert len(b1.aot_stats) == 1 and not b1.aot_stats[0].hit

    b2 = BatchDetector(model, mesh, k_per_level=8, dp_split=1,
                       aot_dir=aot_dir)
    out2 = b2.detect_batch(ims)
    assert b2.aot_stats[0].hit, "expected sharded AOT cache hit"
    np.testing.assert_array_equal(np.asarray(out1.score),
                                  np.asarray(out2.score))

    ref = BatchDetector(model, mesh, k_per_level=8,
                        dp_split=1).detect_batch(ims)
    np.testing.assert_array_equal(np.asarray(out2.score),
                                  np.asarray(ref.score))
    np.testing.assert_array_equal(np.asarray(out2.loc),
                                  np.asarray(ref.loc))

    # a different mesh SHAPE over the same devices must miss
    mesh2 = make_mesh((4, 1), devices=jax.devices()[:4])
    b3 = BatchDetector(model, mesh2, k_per_level=8, dp_split=1,
                       aot_dir=aot_dir)
    b3.detect_batch(ims)
    assert not b3.aot_stats[0].hit


def test_aot_corrupt_artifact_falls_back(setup):
    import glob
    import os

    model, im, aot_dir = setup
    det = Detector(model, k_per_level=8, aot_dir=aot_dir)
    ref = _entries(det.detect_raw(im))
    (path,) = glob.glob(os.path.join(aot_dir, "aot_*.bin"))
    with open(path, "wb") as f:
        f.write(b"garbage")
    det2 = Detector(model, k_per_level=8, aot_dir=aot_dir)
    out = det2.detect_raw(im)                 # silent recompile
    assert not det2.aot_stats[0].hit
    assert _entries(out) == ref


def test_aot_scale_sharded(setup):
    """AOT restart of the scale-sharded (latency) serving program —
    the capability-matrix row VERDICT r4 flagged missing."""
    import jax

    from partsbaseddetector_tpu.parallel.scale_sharded import (
        ScaleShardedDetector, make_scale_mesh)

    model, im, aot_dir = setup
    mesh = make_scale_mesh((2, 2), devices=jax.devices()[:4])

    s1 = ScaleShardedDetector(model, mesh, k_per_level=8,
                              aot_dir=aot_dir)
    out1 = s1.detect_raw(im)
    assert len(s1.aot_stats) == 1 and not s1.aot_stats[0].hit

    s2 = ScaleShardedDetector(model, mesh, k_per_level=8,
                              aot_dir=aot_dir)
    out2 = s2.detect_raw(im)
    assert s2.aot_stats[0].hit, s2.aot_stats[0].fallback_reason
    np.testing.assert_array_equal(np.asarray(out1.score),
                                  np.asarray(out2.score))

    ref = ScaleShardedDetector(model, mesh,
                               k_per_level=8).detect_raw(im)
    assert _entries(out2) == _entries(ref)


def test_aot_scale_sharded_depth(setup):
    """Depth-pruned scale-sharded program AOT-caches and keys on the
    DepthPrune values (stale-constant protection)."""
    import jax

    from partsbaseddetector_tpu.infer.detector import DepthPrune
    from partsbaseddetector_tpu.parallel.scale_sharded import (
        ScaleShardedDetector, make_scale_mesh)

    model, im, aot_dir = setup
    mesh = make_scale_mesh((4, 1), devices=jax.devices()[:4])
    prune = DepthPrune(part_width_m=0.3, fx=500.0, tol=0.5)
    depth = np.zeros(im.shape[:2], np.float32)

    s1 = ScaleShardedDetector(model, mesh, k_per_level=8,
                              depth_prune=prune, aot_dir=aot_dir)
    out1 = s1.detect_raw(im, depth=depth)
    assert not s1.aot_stats[0].hit

    s2 = ScaleShardedDetector(model, mesh, k_per_level=8,
                              depth_prune=prune, aot_dir=aot_dir)
    out2 = s2.detect_raw(im, depth=depth)
    assert s2.aot_stats[0].hit
    np.testing.assert_array_equal(np.asarray(out1.score),
                                  np.asarray(out2.score))

    # different pruning constants must MISS (they are baked into the
    # executable)
    s3 = ScaleShardedDetector(
        model, mesh, k_per_level=8, aot_dir=aot_dir,
        depth_prune=DepthPrune(part_width_m=0.6, fx=500.0, tol=0.5))
    s3.detect_raw(im, depth=depth)
    assert not s3.aot_stats[0].hit


def test_aot_pipelined(setup):
    """AOT restart of BOTH pipeline stage programs (front + back
    groups), bit-identical to the jit path."""
    import jax

    from partsbaseddetector_tpu.parallel.pipeline import \
        PipelinedDetector

    model, im, aot_dir = setup
    devs = jax.devices()
    p1 = PipelinedDetector(model, front=devs[0], back=devs[1],
                           k_per_level=8, dp_split=1, aot_dir=aot_dir)
    out1 = p1.detect_raw(im)
    assert len(p1.aot_stats) == 2
    assert not p1.aot_stats[0].hit and not p1.aot_stats[1].hit

    p2 = PipelinedDetector(model, front=devs[0], back=devs[1],
                           k_per_level=8, dp_split=1, aot_dir=aot_dir)
    out2 = p2.detect_raw(im)
    assert p2.aot_stats[0].hit and p2.aot_stats[1].hit
    np.testing.assert_array_equal(np.asarray(out1.score),
                                  np.asarray(out2.score))

    ref = PipelinedDetector(model, front=devs[0], back=devs[1],
                            k_per_level=8, dp_split=1).detect_raw(im)
    assert _entries(out2) == _entries(ref)

    # streamed frames reuse the loaded executables (no new stats)
    n_stats = len(p2.aot_stats)
    outs = list(p2.stream([im, im]))
    assert len(outs) == 2 and len(p2.aot_stats) == n_stats
