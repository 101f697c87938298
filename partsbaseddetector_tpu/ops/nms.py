"""Non-maximum suppression ops, on device.

Three variants matching the reference's three NMS mechanisms:

  * grid_nms     — score-MAP local-maxima mask, the Neubeck & Van Gool
                   block NMS (reference: src/nms.cpp:84-129).  The
                   reference's block algorithm selects exactly the
                   elements strictly greater than every other element in
                   their (2*sz+1)^2 neighborhood (for distinct values);
                   we compute that definition directly with reduce_window
                   max (a constant map has no maxima, same as the
                   reference's documented semantics, src/nms.cpp:55-56).
  * paint_nms    — the reference's greedy candidate "paint" NMS: walk
                   candidates best-first, reject any whose bounding box
                   is already painted more than `overlap`, paint kept
                   boxes (reference: include/Candidate.hpp:277-304).
  * part_nms     — the Matlab per-part-box greedy suppression with the
                   covering box appended (reference:
                   matlab/detection/nms.m:24-68).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from partsbaseddetector_tpu.ops.argmax import Candidates


@partial(jax.jit, static_argnames=("sz",))
def grid_nms(src: jnp.ndarray, sz: int, mask=None) -> jnp.ndarray:
    """Local-maxima mask of a 2-D score map.

    src: (H, W); sz: window radius parameter (same meaning as the
    reference: maxima end up at least sz+1 apart); mask: optional (H, W)
    boolean of eligible elements.  Returns (H, W) bool."""
    if mask is not None:
        src = jnp.where(mask, src, -jnp.inf)
    win = 2 * sz + 1
    neigh_max = jax.lax.reduce_window(
        src, -jnp.inf, jax.lax.max, (win, win), (1, 1),
        [(sz, sz), (sz, sz)])
    is_max = (src >= neigh_max) & jnp.isfinite(src)
    # strictness: the max must be unique in its window
    cnt = jax.lax.reduce_window(
        is_max.astype(jnp.int32), 0, jax.lax.add, (win, win), (1, 1),
        [(sz, sz), (sz, sz)])
    return is_max & (cnt == 1)


def _bbox_of(boxes: jnp.ndarray) -> jnp.ndarray:
    """(.., P, 4) part boxes -> (.., 4) covering box (hull)
    (reference: include/Candidate.hpp:105-111)."""
    return jnp.stack([boxes[..., 0].min(-1), boxes[..., 1].min(-1),
                      boxes[..., 2].max(-1), boxes[..., 3].max(-1)],
                     axis=-1)


@partial(jax.jit, static_argnames=("imsize",))
def paint_nms(cands: Candidates, imsize, overlap: float = 0.0
              ) -> Candidates:
    """Greedy paint NMS over score-sorted candidates.

    Walks candidates in order (the caller must pass them sorted, as the
    reference does after Candidate::sort), keeps a candidate iff the
    painted fraction of its covering box is <= overlap, then paints it.
    Exact replication of the reference scratch-image algorithm
    (include/Candidate.hpp:277-304) with the scratch kept on device.
    Returns the candidates with .valid updated."""
    H, W = imsize
    K = cands.capacity
    bb = _bbox_of(cands.boxes)                    # (K, 4)
    # clip to image bounds (reference: box & bounds).  cv::Rect built
    # from two points treats the bottom-right as EXCLUSIVE (width =
    # x2 - x1), so the painted region is [x1, x2) x [y1, y2)
    x1 = jnp.clip(jnp.floor(bb[:, 0]), 0, W).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor(bb[:, 1]), 0, H).astype(jnp.int32)
    x2 = jnp.clip(jnp.floor(bb[:, 2]), 0, W).astype(jnp.int32)
    y2 = jnp.clip(jnp.floor(bb[:, 3]), 0, H).astype(jnp.int32)
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]

    def step(i, carry):
        scratch, keep = carry
        region = ((yy >= y1[i]) & (yy < y2[i])
                  & (xx >= x1[i]) & (xx < x2[i]))
        area = jnp.maximum((x2[i] - x1[i]) * (y2[i] - y1[i]), 1)
        painted = jnp.sum(scratch & region)
        ok = (painted / area <= overlap) & cands.valid[i]
        scratch = scratch | (region & ok)
        keep = keep.at[i].set(ok)
        return scratch, keep

    scratch0 = jnp.zeros((H, W), bool)
    keep0 = jnp.zeros((K,), bool)
    _, keep = jax.lax.fori_loop(0, K, step, (scratch0, keep0))
    return Candidates(score=cands.score, valid=keep,
                      component=cands.component, level=cands.level,
                      boxes=cands.boxes, loc=cands.loc)


@jax.jit
def part_nms(cands: Candidates, overlap: float = 0.5) -> Candidates:
    """Greedy per-part-box suppression (Matlab nms.m semantics).

    For each pair (kept i, candidate j): per part column (plus the
    covering box appended), overlap o = max over columns of
    intersection(i, j) / area(i); suppress j if o > overlap
    (reference: matlab/detection/nms.m:50-68).  Candidates must be
    score-sorted descending."""
    boxes = jnp.concatenate(
        [cands.boxes, _bbox_of(cands.boxes)[:, None, :]], axis=1)
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))   # (K, P+1)
    area = (x2 - x1 + 1) * (y2 - y1 + 1)

    xx1 = jnp.maximum(x1[:, None], x1[None])             # (Ki, Kj, P+1)
    yy1 = jnp.maximum(y1[:, None], y1[None])
    xx2 = jnp.minimum(x2[:, None], x2[None])
    yy2 = jnp.minimum(y2[:, None], y2[None])
    w = jnp.maximum(xx2 - xx1 + 1, 0)
    h = jnp.maximum(yy2 - yy1 + 1, 0)
    inter = w * h
    o = (inter / area[:, None]).max(-1)                  # (Ki, Kj)

    K = cands.capacity

    # walk best-first: if i is still alive, suppress all j > i with
    # o[i, j] > overlap
    def step(i, keep):
        idx = jnp.arange(K)
        sup = (o[i] > overlap) & (idx > i) & keep[i]
        return keep & ~sup

    keep = jax.lax.fori_loop(0, K, step, cands.valid)
    return Candidates(score=cands.score, valid=keep,
                      component=cands.component, level=cands.level,
                      boxes=cands.boxes, loc=cands.loc)
