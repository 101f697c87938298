"""Streaming pipeline tests (the ROS-node/ECTO-cell equivalent)."""

import numpy as np

from partsbaseddetector_tpu.infer.stream import (StreamingDetector,
                                                 detections_mask)
from partsbaseddetector_tpu.models import synthetic
from partsbaseddetector_tpu.post.depth import CameraModel
from partsbaseddetector_tpu.post.poses import poses_from_part_centers


def _setup():
    model = synthetic.tiny(seed=7)
    model.thresh = -1e9
    cam = CameraModel(fx=80, fy=80, cx=48, cy=48)
    sd = StreamingDetector(model, camera=cam, max_candidates=8)
    rng = np.random.default_rng(3)
    rgb = (rng.random((96, 96, 3)) * 255).astype(np.uint8)
    depth = np.full((96, 96), 2.0, np.float32)
    xs, ys = np.meshgrid(np.arange(96), np.arange(96))
    cloud = np.stack([(xs - 48) / 80.0 * 2.0, (ys - 48) / 80.0 * 2.0,
                      np.full_like(xs, 2.0, dtype=float)], -1)
    return sd, rgb, depth, cloud


def test_stream_sinks_and_messages():
    sd, rgb, depth, cloud = _setup()
    got = {}
    for sink in ("detections", "overlay", "mask", "boxes3d",
                 "clusters", "part_centers", "poses"):
        sd.on(sink, lambda v, s=sink: got.setdefault(s, v))
    res = sd.process(rgb, depth, cloud)
    assert len(res.detections) > 0
    assert res.overlay.shape == rgb.shape and res.overlay.dtype == np.uint8
    assert res.mask.shape == rgb.shape[:2]
    assert res.mask.max() > 0
    assert len(res.boxes3d) == len(res.detections)
    assert len(res.part_centers) == len(res.detections)
    assert set(got) == {"detections", "overlay", "mask", "boxes3d",
                        "clusters", "part_centers", "poses"}
    # poses exist for objects with valid centers
    assert any(p is not None for p in res.poses)


def test_stream_lazy_messages():
    """Messages are only materialized when a sink is attached
    (the reference gates publishers on subscriber count,
    ros/Node.cpp:205-249)."""
    sd, rgb, depth, cloud = _setup()
    res = sd.process(rgb, depth, cloud)
    assert res.overlay is None and res.mask is None
    assert res.boxes3d is None and res.clusters is None


def test_stream_rgb_only():
    sd, rgb, depth, cloud = _setup()
    sd.on("overlay", lambda v: None)
    res = sd.process(rgb)     # no depth/cloud: 2-D path only
    assert res.overlay is not None
    assert res.boxes3d is None


def test_detections_mask_ordering():
    from partsbaseddetector_tpu.infer.detector import Detection
    d1 = Detection(score=2.0, component=0, level=0,
                   parts=np.array([[0, 0, 50, 50]], float),
                   locations=np.zeros((1, 3), np.int64))
    d2 = Detection(score=1.0, component=0, level=0,
                   parts=np.array([[25, 25, 80, 80]], float),
                   locations=np.zeros((1, 3), np.int64))
    mask = detections_mask((100, 100), [d1, d2])
    assert mask[10, 10] == 1
    assert mask[70, 70] == 2
    assert mask[30, 30] == 1   # first (best) detection wins overlap


def test_poses_pca_orientation():
    # points along x axis -> principal axis x; quaternion normalized
    pts = np.array([[0, 0, 0], [1, 0.01, 0], [2, -0.01, 0],
                    [3, 0.02, 0]], float)
    poses = poses_from_part_centers([pts, np.zeros((0, 3))])
    assert poses[1] is None
    p = poses[0]
    np.testing.assert_allclose(np.linalg.norm(p.orientation), 1.0,
                               atol=1e-9)
    np.testing.assert_allclose(p.position, pts.mean(0), atol=1e-12)


def test_stream_micro_batched_matches_process():
    """process_batch / stream (micro-batched serving) must reproduce the
    per-frame process() results frame by frame."""
    sd, rgb, depth, cloud = _setup()
    rng = np.random.default_rng(5)
    frames = [(rng.random((96, 96, 3)) * 255).astype(np.uint8)
              for _ in range(5)]
    singles = [sd.process(f) for f in frames]

    batched = sd.process_batch(np.stack(frames[:4]))
    for s, b in zip(singles[:4], batched):
        assert len(s.detections) == len(b.detections)
        for ds, db in zip(s.detections, b.detections):
            assert ds.level == db.level
            assert abs(ds.score - db.score) < 5e-4
            np.testing.assert_array_equal(ds.locations, db.locations)

    # generator form: 5 frames at batch=4 -> padded final group dropped
    streamed = list(sd.stream(frames, batch=4))
    assert len(streamed) == len(frames)
    for s, b in zip(singles, streamed):
        assert len(s.detections) == len(b.detections)
        for ds, db in zip(s.detections, b.detections):
            assert ds.level == db.level
            assert abs(ds.score - db.score) < 5e-4
            np.testing.assert_array_equal(ds.locations, db.locations)


def test_stream_failure_recovery():
    """Transient device/transport failures at fetch time are detected,
    reported on the 'error' sink, and recovered by re-dispatching the
    batch (kernels are pure, so the retry reproduces the exact result);
    persistent failures raise after max_retries."""
    import pytest

    model = synthetic.tiny(seed=7)
    model.thresh = -1e9
    sd = StreamingDetector(model, max_candidates=8, max_retries=2,
                           retry_backoff_s=0.01)
    rng = np.random.default_rng(5)
    frames = [(rng.random((64, 64, 3)) * 255).astype(np.uint8)
              for _ in range(4)]
    errors = []
    sd.on("error", errors.append)

    clean = sd.process_batch(np.stack(frames))

    real_materialize = StreamingDetector._materialize
    fails = {"n": 2}

    def flaky(cands_b):
        if fails["n"] > 0:
            fails["n"] -= 1
            raise RuntimeError("injected device failure")
        return real_materialize(cands_b)

    sd._materialize = flaky           # instance-level fault injection
    recovered = list(sd.stream(frames, batch=4))
    assert len(errors) == 2
    assert all(e["exception"].args[0] == "injected device failure"
               for e in errors)
    assert len(recovered) == len(frames)
    for c, r in zip(clean, recovered):
        assert len(c.detections) == len(r.detections)
        for dc, dr in zip(c.detections, r.detections):
            assert dc.score == dr.score       # deterministic retry
            np.testing.assert_array_equal(dc.locations, dr.locations)

    # persistent failure exhausts retries and raises
    fails["n"] = 10
    errors.clear()
    with pytest.raises(RuntimeError, match="injected device failure"):
        sd.process_batch(np.stack(frames))
    assert len(errors) == sd.max_retries + 1


def test_stream_depth_pruning_wired():
    """With a depth_prune config, the depth map prunes DETECTION
    responses through every streaming entry point (the reference's
    detect(rgb, depth, candidates) semantics), not just the 3-D post
    stage."""
    from partsbaseddetector_tpu.infer.detector import DepthPrune

    model = synthetic.tiny(seed=7)
    model.thresh = -1e9
    cfg = DepthPrune(part_width_m=0.2, fx=400.0, tol=0.3)
    sd = StreamingDetector(model, max_candidates=8, depth_prune=cfg)
    rng = np.random.default_rng(3)
    rgb = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    far = np.full((64, 64), 500.0, np.float32)   # prunes everything

    assert sd.process(rgb).detections           # no depth: detections
    assert sd.process(rgb, far).detections == []

    frames = [rgb, rgb]
    depths = [np.zeros((64, 64), np.float32), far]
    outs = sd.process_batch(np.stack(frames), depths=np.stack(depths))
    assert outs[0].detections and outs[1].detections == []

    streamed = list(sd.stream(frames, batch=2, depths=depths))
    assert streamed[0].detections and streamed[1].detections == []
