"""On-device candidate extraction and backtracking.

Replaces the reference's unbounded ``Math::find`` + push_back under an
OpenMP critical section (reference: src/DynamicProgram.cpp:189-255,
246-251) with a deterministic fixed-K ``lax.top_k`` per (level,
component), followed by a root-to-leaf pointer walk through the argmax
tables (K*P gathers, unrolled over the static tree).

Box arithmetic replicates the reference exactly:
  xy1 = round((pt - 1) * scale),  xy2 = xy1 + round(size * scale) - 1
(reference: src/DynamicProgram.cpp:238-244; cv::Point*double rounds with
cvRound = half-to-even), with xsize == ysize == filter rows (the
reference's ysize quirk, include/Parts.hpp:185-187).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from partsbaseddetector_tpu.models.part_tree import PackedComponent
from partsbaseddetector_tpu.ops.dp import DPResult


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Candidates:
    """A fixed-capacity batch of detection candidates (SoA)."""

    score: jnp.ndarray      # (K,) f32 root confidence
    valid: jnp.ndarray      # (K,) bool  (score > thresh and in-bounds)
    component: jnp.ndarray  # (K,) int32
    level: jnp.ndarray      # (K,) int32 pyramid level index
    boxes: jnp.ndarray      # (K, P, 4) f32: x1, y1, x2, y2 (image pixels)
    loc: jnp.ndarray        # (K, P, 3) int32: x, y, mixture (grid coords)

    @property
    def capacity(self) -> int:
        return self.score.shape[0]

    def count(self):
        return jnp.sum(self.valid.astype(jnp.int32))


def backtrack(res: DPResult, comp: PackedComponent,
              parent_static: Sequence[int], thresh, scale,
              k: int, true_size=None, component_index: int = 0,
              level_index=0, compose: str = "reference") -> Candidates:
    """Extract the top-k root locations above thresh and walk the tree.

    res: DPResult for one (level, component); scale: pixels per feature
    cell at this level (traced ok); true_size: (h, w) valid extent of the
    response map (traced ok) — padded cells are excluded."""
    H, W = res.rootv.shape
    P = comp.nparts
    rootv = res.rootv
    if true_size is not None:
        h, w = true_size
        inb = ((jnp.arange(H) < h)[:, None] & (jnp.arange(W) < w)[None, :])
        rootv = jnp.where(inb, rootv, -jnp.inf)

    k_eff = min(k, H * W)
    topv, topi = jax.lax.top_k(rootv.ravel(), k_eff)
    if k_eff < k:   # pad to fixed capacity with invalid entries
        topv = jnp.concatenate(
            [topv, jnp.full((k - k_eff,), -jnp.inf, topv.dtype)])
        topi = jnp.concatenate(
            [topi, jnp.zeros((k - k_eff,), topi.dtype)])
    ys = (topi // W).astype(jnp.int32)
    xs = (topi % W).astype(jnp.int32)
    valid = topv > thresh

    from partsbaseddetector_tpu.ops.dp import walk_children
    xv = [None] * P
    yv = [None] * P
    mv = [None] * P
    xv[0], yv[0] = xs, ys
    mv[0] = res.rooti[ys, xs]
    for p in range(1, P):
        par = int(parent_static[p])
        # K-point argmax recomputation per part (see ops/dp.py): the
        # argmax tables the reference stores are never materialized
        xv[p], yv[p], mv[p] = walk_children(
            res, comp, p, mv[par], yv[par], xv[par], compose)

    X = jnp.stack(xv, axis=1)    # (K, P)
    Y = jnp.stack(yv, axis=1)
    Mm = jnp.stack(mv, axis=1)

    scale = jnp.asarray(scale, jnp.float32)
    sizes = comp.fsize[jnp.arange(P)[None, :], Mm]        # (K, P)
    x1 = jnp.rint((X - 1) * scale)
    y1 = jnp.rint((Y - 1) * scale)
    ext = jnp.rint(sizes * scale)
    boxes = jnp.stack([x1, y1, x1 + ext - 1, y1 + ext - 1], axis=-1)

    return Candidates(
        score=topv.astype(jnp.float32),
        valid=valid,
        component=jnp.full((k,), component_index, jnp.int32),
        level=jnp.broadcast_to(
            jnp.asarray(level_index, jnp.int32), (k,)).astype(jnp.int32),
        boxes=boxes.astype(jnp.float32),
        loc=jnp.stack([X, Y, Mm], axis=-1).astype(jnp.int32))


def _root_seeds(rootv, rooti, thresh, k: int, true_size=None):
    """Top-k root positions for one level: (topv, valid, xs, ys, mv)."""
    H, W = rootv.shape
    if true_size is not None:
        h, w = true_size
        inb = ((jnp.arange(H) < h)[:, None]
               & (jnp.arange(W) < w)[None, :])
        rootv = jnp.where(inb, rootv, -jnp.inf)
    k_eff = min(k, H * W)
    topv, topi = jax.lax.top_k(rootv.ravel(), k_eff)
    if k_eff < k:
        topv = jnp.concatenate(
            [topv, jnp.full((k - k_eff,), -jnp.inf, topv.dtype)])
        topi = jnp.concatenate(
            [topi, jnp.zeros((k - k_eff,), topi.dtype)])
    ys = (topi // W).astype(jnp.int32)
    xs = (topi % W).astype(jnp.int32)
    return topv, topv > thresh, xs, ys, rooti[ys, xs]


def _walked_candidates(X, Y, Mm, topv, valid, comp, scales, k: int,
                       component_index: int, levels) -> Candidates:
    """Assemble the flat Candidates pytree from walked positions.
    X/Y/Mm: (L, P, K); topv/valid: (L, K); scales/levels: (L,)."""
    L, P, K = X.shape
    X = jnp.moveaxis(X, 1, 2)          # (L, K, P)
    Y = jnp.moveaxis(Y, 1, 2)
    Mm = jnp.moveaxis(Mm, 1, 2)
    scale = scales.astype(jnp.float32)[:, None, None]
    sizes = comp.fsize[jnp.arange(P)[None, None, :], Mm]  # (L, K, P)
    x1 = jnp.rint((X - 1) * scale)
    y1 = jnp.rint((Y - 1) * scale)
    ext = jnp.rint(sizes * scale)
    boxes = jnp.stack([x1, y1, x1 + ext - 1, y1 + ext - 1], axis=-1)
    out = Candidates(
        score=topv.astype(jnp.float32),
        valid=valid,
        component=jnp.full((L, K), component_index, jnp.int32),
        level=jnp.broadcast_to(levels[:, None], (L, K)).astype(
            jnp.int32),
        boxes=boxes.astype(jnp.float32),
        loc=jnp.stack([X, Y, Mm], axis=-1).astype(jnp.int32))
    return jax.tree.map(
        lambda x: x.reshape((L * k,) + x.shape[2:]), out)


def backtrack_levels(res: DPResult, comp: PackedComponent,
                     parent_static: Sequence[int], thresh,
                     scales: jnp.ndarray, k: int,
                     true_sizes=None, component_index: int = 0,
                     level_offset: int = 0,
                     compose: str = "reference",
                     walk_impl: str = "xla") -> Candidates:
    """Backtracking over a leading levels axis, returning a flat
    Candidates of capacity L*k.

    walk_impl: "xla" (vmapped unrolled gathers) or "pallas" /
    "pallas_interpret" (the fused walk kernel, ops/walk_pallas.py —
    bit-identical results, ~one device op instead of ~3 per part)."""
    L = res.rootv.shape[0]
    levels = jnp.arange(L, dtype=jnp.int32) + level_offset
    if walk_impl.startswith("pallas"):
        from partsbaseddetector_tpu.ops.walk_pallas import \
            walk_tree_pallas

        if true_sizes is None:
            topv, valid, xs, ys, mv = jax.vmap(
                lambda rv, ri: _root_seeds(rv, ri, thresh, k))(
                    res.rootv, res.rooti)
        else:
            topv, valid, xs, ys, mv = jax.vmap(
                lambda rv, ri, ts: _root_seeds(rv, ri, thresh, k, ts))(
                    res.rootv, res.rooti, true_sizes)
        X, Y, Mm = walk_tree_pallas(
            res.scores, res.tmp, xs, ys, mv,
            comp.defw, comp.anchor.astype(jnp.float32), comp.bias,
            jnp.asarray(parent_static, jnp.int32), compose=compose,
            interpret=(walk_impl == "pallas_interpret"))
        return _walked_candidates(X, Y, Mm, topv, valid, comp, scales,
                                  k, component_index, levels)
    if true_sizes is None:
        fn = jax.vmap(lambda r, s, li: backtrack(
            r, comp, parent_static, thresh, s, k, None,
            component_index, li, compose))
        out = fn(res, scales, levels)
    else:
        fn = jax.vmap(lambda r, s, ts, li: backtrack(
            r, comp, parent_static, thresh, s, k, ts,
            component_index, li, compose))
        out = fn(res, scales, true_sizes, levels)
    return jax.tree.map(
        lambda x: x.reshape((L * k,) + x.shape[2:]), out)


def concat_candidates(cands: Sequence[Candidates]) -> Candidates:
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *cands)


def sort_candidates(c: Candidates) -> Candidates:
    """Descending by score, invalid last (score of invalid forced to
    -inf for ordering) — the deterministic replacement for Candidate::
    sort (reference: include/Candidate.hpp:97-99)."""
    key = jnp.where(c.valid, c.score, -jnp.inf)
    order = jnp.argsort(-key)
    return jax.tree.map(lambda x: x[order], c)
