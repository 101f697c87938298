"""Masked latent search on multi-resolution models (VERDICT r4 missing
#3): the Matlab trainer's overlap masking (detect.m:60-101) composed
with multi-scale parts (detect.m:184-212), on every path — single-chip
MultiResDetector, batch-sharded, scale-sharded — vs the multires
oracle; plus the w . detection_feature == score invariant and a latent
training round on a multires model."""

import numpy as np
import pytest

from partsbaseddetector_tpu.models import synthetic
from partsbaseddetector_tpu.oracle import multires as omr
from partsbaseddetector_tpu.train import features as feat_mod


@pytest.fixture(scope="module")
def mr_model():
    m = synthetic.tiny_multires(seed=5)
    m.thresh = -1e9
    return m


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(11)


def _mask_fixtures(model, plan, imsize):
    """(per-bucket masks for the TPU path, per-level masks for the
    oracle) from one set of GT boxes via the trainer's builder."""
    P = model.components[0].nparts
    gt = np.asarray([[6, 6, max(imsize) * 0.6, max(imsize) * 0.6]] * P,
                    float)
    by_level = feat_mod.part_overlap_masks(model, 0, plan, gt, 0.05)
    part_masks, li = [], 0
    for bucket in plan.buckets:
        part_masks.append(np.stack(
            by_level[li:li + len(bucket.levels)]))
        li += len(bucket.levels)
    return part_masks, by_level


def _entries(c):
    return {(int(l), tuple(map(tuple, x))): float(s)
            for s, v, x, l in zip(np.asarray(c.score),
                                  np.asarray(c.valid),
                                  np.asarray(c.loc),
                                  np.asarray(c.level)) if v}


def test_masked_multires_matches_oracle(mr_model, rng):
    from partsbaseddetector_tpu.infer.multires import MultiResDetector

    im = rng.random((80, 96)) * 255
    det = MultiResDetector(mr_model, k_per_level=8)
    part_masks, by_level = _mask_fixtures(mr_model,
                                          det.plan_for(im.shape[:2]),
                                          im.shape[:2])
    got = det.detect_masked_raw(im, part_masks)
    ref = sorted(omr.detect_multires(im, mr_model, by_level),
                 key=lambda c: -c.score)
    gotd = det.candidates_to_detections(got)
    assert len(gotd) > 0 and len(ref) > 0
    n = min(5, len(ref), len(gotd))
    np.testing.assert_allclose([d.score for d in gotd[:n]],
                               [c.score for c in ref[:n]], atol=2e-4)
    np.testing.assert_allclose(gotd[0].parts, ref[0].parts, atol=1.01)
    assert tuple(gotd[0].locations[0]) == tuple(ref[0].locations[0])

    # the mask is load-bearing: masked output differs from unmasked
    um = _entries(det.detect_raw(im))
    assert _entries(got) != um

    # every masked detection's parts lie in allowed cells at each
    # part's OWN level (the per-octave mask semantics)
    scales = mr_model.part_scales(0)
    for d in gotd[:5]:
        for p in range(mr_model.components[0].nparts):
            lvl = d.level - scales[p] * mr_model.interval
            x, y, _ = d.locations[p]
            assert by_level[lvl][p, int(y), int(x)]


def test_masked_multires_sharded_paths(mr_model, rng):
    """Batch-sharded and scale-sharded masked multires match the
    single-chip result (guards removed; capability matrix complete)."""
    import jax

    from partsbaseddetector_tpu.infer.multires import MultiResDetector
    from partsbaseddetector_tpu.parallel.mesh import make_mesh
    from partsbaseddetector_tpu.parallel.scale_sharded import (
        ScaleShardedDetector, make_scale_mesh)
    from partsbaseddetector_tpu.parallel.sharded import BatchDetector

    im = (rng.random((64, 64, 3)) * 255).astype(np.float32)
    det = MultiResDetector(mr_model, k_per_level=8)
    part_masks, _ = _mask_fixtures(mr_model,
                                   det.plan_for(im.shape[:2]),
                                   im.shape[:2])
    single = _entries(det.detect_masked_raw(im, part_masks))
    assert single

    bdet = BatchDetector(mr_model, make_mesh((4, 2)), k_per_level=8)
    images = np.stack([im] * 4)
    bmasks = tuple(np.stack([m] * 4) for m in part_masks)
    cands = bdet.detect_masked_batch(images, bmasks)
    for b in range(4):
        got = _entries(jax.tree.map(lambda x: x[b], cands))
        assert got.keys() == single.keys()
        for k in got:
            assert abs(got[k] - single[k]) < 2e-4

    sdet = ScaleShardedDetector(mr_model, make_scale_mesh((4, 2)),
                                k_per_level=8)
    got = _entries(sdet.detect_masked_raw(im, part_masks))
    assert got.keys() == single.keys()
    for k in got:
        assert abs(got[k] - single[k]) < 2e-4


def test_multires_detection_feature_invariant(mr_model, rng):
    """w . detection_feature == score on MULTIRES detections: each
    part's HOG patch at its own level, strided deformation features
    (defvector with step = 2^ds)."""
    from partsbaseddetector_tpu.infer.multires import MultiResDetector
    from partsbaseddetector_tpu.train.features import detection_feature
    from partsbaseddetector_tpu.train.vectorize import (BlockLayout,
                                                        model_to_vec)

    im = rng.random((72, 88)) * 255
    layout = BlockLayout.for_model(mr_model)
    w, _, _, _ = model_to_vec(mr_model, layout)
    det = MultiResDetector(mr_model, k_per_level=8)
    dets = det.detect(im, max_detections=10)
    feats = det.pyramid_features(im)
    assert len(dets) > 0
    for d in dets:
        vec = detection_feature(mr_model, layout, d, feats)
        rec = float(w @ vec)
        assert abs(rec - d.score) < 5e-3, (rec, d.score)


def test_latent_train_round_on_multires(mr_model, rng, tmp_path):
    """One latent-SSVM round retrains a multi-resolution model end to
    end (masked search -> feature write-back -> QP -> model update) —
    previously an explicit NotImplementedError."""
    import dataclasses

    from partsbaseddetector_tpu.train.trainer import (TrainConfig,
                                                      latent_train)

    model = dataclasses.replace(mr_model)
    P = model.components[0].nparts
    pos_images = [rng.random((64, 64)) * 255 for _ in range(2)]
    gt_boxes = np.asarray([[[4, 4, 44, 44]] * P] * 2, float)
    neg_images = [rng.random((64, 64)) * 40 for _ in range(2)]
    logs = []
    cfg = TrainConfig(nmix=1, binsize=model.binsize,
                      interval=model.interval, latent_iters=1,
                      nmax=200, k_per_level=8, neg_per_image=4,
                      C=0.05, overlap=0.05)
    out = latent_train(model, pos_images, gt_boxes, neg_images, cfg,
                       logs.append)
    assert out is not None
    assert any("latent positives" in s for s in logs)
    # at least one latent positive was found (the multires masked
    # search produced usable detections)
    n = [int(s.split(":")[1].split()[0]) for s in logs
         if "latent positives" in s]
    assert n and n[0] > 0
    # the retrained model still detects (structure preserved)
    from partsbaseddetector_tpu.infer.multires import MultiResDetector
    out.thresh = -1e9
    d = MultiResDetector(out, k_per_level=4).detect(
        pos_images[0], max_detections=1)
    assert d
