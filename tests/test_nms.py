"""NMS op tests: device ops vs the faithful NumPy oracle variants."""

import numpy as np
import jax.numpy as jnp
import pytest

from partsbaseddetector_tpu.oracle import postproc
from partsbaseddetector_tpu.ops.argmax import Candidates
from partsbaseddetector_tpu.ops import nms as nms_ops


def _mk_cands(boxes, scores, P=1):
    """boxes: (K, 4) covering boxes -> Candidates with P part boxes."""
    boxes = np.asarray(boxes, np.float32)
    K = len(boxes)
    part_boxes = np.repeat(boxes[:, None, :], P, axis=1)
    return Candidates(
        score=jnp.asarray(scores, jnp.float32),
        valid=jnp.ones(K, bool),
        component=jnp.zeros(K, jnp.int32),
        level=jnp.zeros(K, jnp.int32),
        boxes=jnp.asarray(part_boxes),
        loc=jnp.zeros((K, P, 3), jnp.int32))


# -------------------------------------------------------------- grid NMS

@pytest.mark.parametrize("sz", [1, 3, 7])
def test_grid_nms_matches_blockwise(rng, sz):
    src = rng.standard_normal((40, 50))
    ours = np.asarray(nms_ops.grid_nms(jnp.asarray(src), sz))
    ref = postproc.grid_nms_blockwise(src, sz)
    np.testing.assert_array_equal(ours, ref)


def test_grid_nms_masked(rng):
    src = rng.standard_normal((30, 30))
    mask = src > 0.5
    ours = np.asarray(nms_ops.grid_nms(jnp.asarray(src), 2,
                                       jnp.asarray(mask)))
    ref = postproc.grid_nms_blockwise(src, 2, mask)
    np.testing.assert_array_equal(ours, ref)


def test_grid_nms_constant_has_no_maxima():
    src = np.ones((20, 20))
    ours = np.asarray(nms_ops.grid_nms(jnp.asarray(src), 2))
    assert not ours.any()   # reference doc: src/nms.cpp:55-56


# -------------------------------------------------------------- paint NMS

def test_paint_nms_matches_oracle(rng):
    K = 24
    boxes = np.zeros((K, 4))
    boxes[:, 0] = rng.integers(0, 60, K)
    boxes[:, 1] = rng.integers(0, 40, K)
    boxes[:, 2] = boxes[:, 0] + rng.integers(8, 30, K)
    boxes[:, 3] = boxes[:, 1] + rng.integers(8, 30, K)
    scores = -np.sort(-rng.random(K))
    cands = _mk_cands(boxes, scores)
    for overlap in (0.0, 0.25):
        out = nms_ops.paint_nms(cands, (64, 96), overlap)
        ref = postproc.paint_nms(boxes, scores, (64, 96), overlap)
        np.testing.assert_array_equal(np.asarray(out.valid), ref)


# -------------------------------------------------------------- part NMS

def test_part_nms_matches_oracle(rng):
    K, P = 20, 4
    part_boxes = np.zeros((K, P, 4))
    part_boxes[..., 0] = rng.integers(0, 50, (K, P))
    part_boxes[..., 1] = rng.integers(0, 50, (K, P))
    part_boxes[..., 2] = part_boxes[..., 0] + rng.integers(5, 20, (K, P))
    part_boxes[..., 3] = part_boxes[..., 1] + rng.integers(5, 20, (K, P))
    scores = -np.sort(-rng.random(K))
    cands = Candidates(
        score=jnp.asarray(scores, jnp.float32),
        valid=jnp.ones(K, bool),
        component=jnp.zeros(K, jnp.int32),
        level=jnp.zeros(K, jnp.int32),
        boxes=jnp.asarray(part_boxes, jnp.float32),
        loc=jnp.zeros((K, P, 3), jnp.int32))
    for overlap in (0.3, 0.6):
        out = nms_ops.part_nms(cands, overlap)
        ref = postproc.part_nms(part_boxes, scores, overlap)
        np.testing.assert_array_equal(np.asarray(out.valid), ref)


def test_part_nms_respects_invalid():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                     np.float32)
    cands = _mk_cands(boxes, [3.0, 2.0, 1.0])
    cands = Candidates(score=cands.score,
                       valid=jnp.asarray([False, True, True]),
                       component=cands.component, level=cands.level,
                       boxes=cands.boxes, loc=cands.loc)
    out = nms_ops.part_nms(cands, 0.3)
    # candidate 0 invalid: must not suppress candidate 1
    np.testing.assert_array_equal(np.asarray(out.valid),
                                  [False, True, True])


# -------------------------------------------------------------- eval

def test_pck_perfect_and_off():
    from partsbaseddetector_tpu.utils.eval import pck
    gt = [np.array([[10.0, 10.0], [20.0, 20.0]])] * 3
    pred_good = [g.copy() for g in gt]
    assert np.allclose(pck(pred_good, gt, [10.0] * 3), 1.0)
    pred_half = [g + np.array([[0, 0], [100, 100]]) for g in gt]
    np.testing.assert_allclose(pck(pred_half, gt, [10.0] * 3),
                               [1.0, 0.0])


def test_apk_simple():
    from partsbaseddetector_tpu.utils.eval import (KeypointDetection,
                                                   KeypointGT, apk)
    gts = [KeypointGT(points=np.array([[10.0, 10.0]]), scale=10.0),
           KeypointGT(points=np.array([[5.0, 5.0]]), scale=10.0)]
    dets = [KeypointDetection(0, 0.9, np.array([11.0, 10.0])),
            KeypointDetection(1, 0.8, np.array([50.0, 50.0])),
            KeypointDetection(1, 0.7, np.array([5.0, 6.0]))]
    ap, prec, rec = apk(dets, gts, 0.5)
    assert 0.5 < ap <= 1.0
    assert rec[-1] == 1.0


def test_apk_duplicate_detection_is_fp():
    from partsbaseddetector_tpu.utils.eval import (KeypointDetection,
                                                   KeypointGT, apk)
    gts = [KeypointGT(points=np.array([[10.0, 10.0]]), scale=10.0)]
    dets = [KeypointDetection(0, 0.9, np.array([10.0, 10.0])),
            KeypointDetection(0, 0.8, np.array([10.5, 10.0]))]
    ap, prec, rec = apk(dets, gts, 0.5)
    assert prec[-1] == 0.5  # second one is a duplicate -> FP
