"""Min-sum dynamic program over the part tree, as a level-synchronous
scan.

Reimagines the reference's per-(scale, component) OpenMP loop with nested
cv::Mat arithmetic (reference: src/DynamicProgram.cpp:66-173) as a single
``lax.scan`` over parts in reverse topological order.  Parts are stored
root-first with parent < child (guaranteed by the schema validation), so
the reverse scan visits children before parents, exactly like the
reference's ``for (p = nparts-1; p > 0; --p)``
(reference: src/DynamicProgram.cpp:95).

TPU-shaped design decisions (vs a naive translation):

  * scores are keyed by part slot (P, M, H, W) rather than by filter id
    (the reference's ncscores, src/DynamicProgram.cpp:93-155) —
    equivalent for models without filter aliasing, asserted at pack time;

  * the forward scan computes ONLY max-reductions — no argmax anywhere.
    The reference materializes full Ix/Iy/Ik argmax tables during the
    forward pass (src/DynamicProgram.cpp:110-151); on TPU those argmax
    sweeps double the distance-transform cost and the (H, W)-sized
    tables are touched at only K candidate points during backtracking.
    Instead the scan emits its two max fields:
      scores[p] — each part's fully-accumulated DT input (the scan
                  carry: a part's score never changes once visited,
                  because all its children precede it in the scan), and
      tmp[p]    — the x-pass row maxima,
    and backtracking RECOMPUTES the argmaxes at the K visited positions
    (O(H + N) work per candidate-part instead of O(H*W) stored —
    ops/argmax.py via walk_children below);

  * mixture reduction masks padded mixture slots with NEG biases so they
    can never win (the reference's reduceMax over live mixtures,
    include/Math.hpp:148-185).

The DT argmin composition quirk (reference: include/DistanceTransform.
hpp:233-244 — the row-pass table is indexed by parent y and Iy is
gathered through Ix) is reproduced exactly by the recomputation order in
walk_children ("reference" mode) or fixed ("correct" mode).
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

#: unroll factor of the leaf->root part scan (PBD_DP_UNROLL).  Unrolling
#: lets XLA fuse across consecutive part steps and drop the per-iteration
#: carry relayout copies the profiler attributes ~3 ms/frame to — at the
#: cost of a bigger program (compile time).  Default 1; see PERF.md
#: §scan-unroll for the measured sweep.
SCAN_UNROLL = int(os.environ.get("PBD_DP_UNROLL", "1"))

from partsbaseddetector_tpu.models.part_tree import PackedComponent
from partsbaseddetector_tpu.ops.common import NEG
from partsbaseddetector_tpu.ops.dt import dt_max_x, dt_max_y


class DPResult(NamedTuple):
    rootv: jnp.ndarray    # (H, W) root score map (bias added, maxed)
    rooti: jnp.ndarray    # (H, W) int32 best root mixture
    scores: jnp.ndarray   # (P, M, H, W) accumulated DT inputs per part
    tmp: jnp.ndarray      # (P, M, H, W) x-pass maxima (rows = child y)


@partial(jax.jit, static_argnames=("compose", "dt_impl"))
def dp_min(pdfs: jnp.ndarray, comp: PackedComponent,
           compose: str = "reference",
           dt_impl: str = "xla",
           part_mask=None, true_size=None) -> DPResult:
    """Run the DP for one component on one response map.

    pdfs: (H, W, F) filter responses for ALL model filters (the output of
    ops.conv.conv_bank), matching the reference's responses-by-filter-id
    convention (include/Parts.hpp:165-168).

    true_size: optional (2,) valid (h, w) extent of the response map —
    cells beyond it are masked to NEG HERE, fused into the scores0
    construction this DP materializes anyway, instead of a separate
    full-(L, fh, fw, F)-tensor rewrite per bucket (the
    pad_maximum_fusion the round-5 profiler priced at ~0.86 ms/frame).
    Value-identical to pre-masked pdfs: masked cells are NEG either
    way, so the DT can never pull a padded cell into the true region.
    """
    if compose not in ("reference", "correct"):
        raise ValueError(compose)
    if dt_impl not in ("xla",):
        raise ValueError(f"dt_impl {dt_impl!r} (the dense max-only XLA "
                         "formulation measured fastest on TPU; see "
                         "PERF.md §DT for the Pallas negative result)")
    P, M = comp.filterid.shape
    H, W = pdfs.shape[:2]
    assert H < 4096 and W < 4096 and M < 128, (H, W, M)
    if comp.aliased:
        # shared filter ids within the component: the accumulation
        # buffers alias by filter id, exactly as in the reference
        return _dp_min_aliased(pdfs, comp, compose, part_mask,
                               true_size)
    pdfs_f = jnp.moveaxis(pdfs, -1, 0)                 # (F, H, W)
    scores0 = pdfs_f[comp.filterid]                    # (P, M, H, W)
    # invalid mixture slots must never win any max
    scores0 = jnp.where(comp.mix_valid[..., None, None], scores0, NEG)
    if true_size is not None:
        inb = _inbounds(H, W, true_size)
        scores0 = jnp.where(inb[None, None], scores0, NEG)
    if part_mask is not None:
        # latent-positive search constraint: part placements outside the
        # allowed region are suppressed (the reference's overlap masking,
        # matlab/detection/detect.m:60-101)
        scores0 = jnp.where(part_mask[:, None, :, :], scores0, NEG)

    def step(scores, p):
        s = scores[p]                                  # (M, H, W)
        w = comp.defw[p]                               # (M, 4)
        anc = comp.anchor[p]                           # (M, 2)
        # x then y pass, both transpose-free with sublane reductions
        # (ops/dt.dt_max_x/dt_max_y), vmapped over mixtures
        tmp = jax.vmap(lambda sm, wm, am: dt_max_x(
            sm, wm[0], wm[1], am[0]))(s, w, anc)       # (M, H, W)
        sdt = jax.vmap(lambda tm, wm, am: dt_max_y(
            tm, wm[2], wm[3], am[1]))(tmp, w, anc)     # (M, H, W)
        # child->parent mixture-pair bias, max over child mixtures
        weighted = sdt[None, :, :, :] + \
            comp.bias[p].T[:, :, None, None]           # (Mp, Mc, H, W)
        maxv = jnp.max(weighted, axis=1)
        scores = scores.at[comp.parent[p]].add(maxv)
        return scores, tmp

    parts_rev = jnp.arange(P - 1, 0, -1)
    scores, tmps = jax.lax.scan(step, scores0, parts_rev,
                                unroll=min(SCAN_UNROLL, max(P - 1, 1)))

    # scan outputs visited P-1..1 -> part-index order with a zero row for
    # the root (whose tmp is never read)
    tmps = jnp.flip(tmps, axis=0)
    tmp = jnp.concatenate(
        [jnp.zeros((1,) + tmps.shape[1:], tmps.dtype), tmps], axis=0)

    # root: add the scalar root bias to every root mixture and max
    # (reference: src/DynamicProgram.cpp:162-171)
    rootw = scores[0] + comp.root_bias                 # (M, H, W)
    rootw = jnp.where(comp.mix_valid[0][:, None, None], rootw, NEG)
    rooti = jnp.argmax(rootw, axis=0).astype(jnp.int32)
    rootv = jnp.max(rootw, axis=0)
    return DPResult(rootv, rooti, scores, tmp)


def _inbounds(H: int, W: int, true_size) -> jnp.ndarray:
    """(H, W) bool: True inside the (h, w) valid extent."""
    h, w = true_size[0], true_size[1]
    return ((jnp.arange(H) < h)[:, None]
            & (jnp.arange(W) < w)[None, :])


def _dp_min_aliased(pdfs: jnp.ndarray, comp: PackedComponent,
                    compose: str, part_mask=None,
                    true_size=None) -> DPResult:
    """DP variant for components with shared filter ids.

    The reference's scratch score vector is keyed BY FILTER ID
    (``ncscores``, sized like the response vector — src/DynamicProgram.
    cpp:93 with the reads/writes at :115-118 and :152-155 going through
    ``ComponentPart::score`` = scores[filterid[p][m]],
    include/Parts.hpp:165-168).  When several (part, mixture) slots of
    one component share a filter id, their accumulation buffers ALIAS:
    messages written for one slot are visible to every later read of any
    slot with the same id, in part-visit order.  This scan reproduces
    that exactly by carrying a per-filter accumulator ``acc`` (F, H, W)
    — read(p, m) = pdf[fid[p][m]] + acc[fid[p][m]] at visit time, write
    acc[fid[parent][mp]] += maxv[mp] — and emitting each part's
    VISIT-TIME score (the DT input) so backtracking recomputes argmaxes
    against the same values the forward pass used.  For components
    where every filter id is unique this is semantically identical to
    the part-keyed scan in :func:`dp_min` (the default, which carries
    one fewer (P, M, H, W) tensor through the scan)."""
    P, M = comp.filterid.shape
    H, W = pdfs.shape[:2]
    pdfs_f = jnp.moveaxis(pdfs, -1, 0)                 # (F, H, W)
    F = pdfs_f.shape[0]

    inb = None if true_size is None else _inbounds(H, W, true_size)

    def read(p, acc):
        fid = comp.filterid[p]                         # (M,)
        s = pdfs_f[fid] + acc[fid]                     # (M, H, W)
        s = jnp.where(comp.mix_valid[p][:, None, None], s, NEG)
        if inb is not None:
            s = jnp.where(inb[None], s, NEG)
        if part_mask is not None:
            s = jnp.where(part_mask[p][None, :, :], s, NEG)
        return s

    def step(acc, p):
        s = read(p, acc)
        w = comp.defw[p]                               # (M, 4)
        anc = comp.anchor[p]                           # (M, 2)
        tmp = jax.vmap(lambda sm, wm, am: dt_max_x(
            sm, wm[0], wm[1], am[0]))(s, w, anc)       # (M, H, W)
        sdt = jax.vmap(lambda tm, wm, am: dt_max_y(
            tm, wm[2], wm[3], am[1]))(tmp, w, anc)     # (M, H, W)
        weighted = sdt[None, :, :, :] + \
            comp.bias[p].T[:, :, None, None]           # (Mp, Mc, H, W)
        maxv = jnp.max(weighted, axis=1)               # (Mp, H, W)
        par = comp.parent[p]
        # padded parent-mixture slots repeat mixture 0's filter id, so
        # their (garbage) maxv must not pollute the real buffer: zero it
        maxv = jnp.where(comp.mix_valid[par][:, None, None], maxv, 0.0)
        acc = acc.at[comp.filterid[par]].add(maxv)
        return acc, (s, tmp)

    acc0 = jnp.zeros((F, H, W), pdfs.dtype)
    parts_rev = jnp.arange(P - 1, 0, -1)
    acc, (s_vis, tmps) = jax.lax.scan(step, acc0, parts_rev)

    s_vis = jnp.flip(s_vis, axis=0)
    tmps = jnp.flip(tmps, axis=0)
    root_s = read(0, acc)                              # (M, H, W)
    scores = jnp.concatenate([root_s[None], s_vis], axis=0)
    tmp = jnp.concatenate(
        [jnp.zeros((1,) + tmps.shape[1:], tmps.dtype), tmps], axis=0)

    rootw = root_s + comp.root_bias                    # (M, H, W)
    rooti = jnp.argmax(rootw, axis=0).astype(jnp.int32)
    rootv = jnp.max(rootw, axis=0)
    return DPResult(rootv, rooti, scores, tmp)


def dp_min_levels(pdfs: jnp.ndarray, comp: PackedComponent,
                  compose: str = "reference",
                  dt_impl: str = "xla", part_masks=None,
                  true_sizes=None) -> DPResult:
    """vmap of dp_min over a leading levels axis: pdfs (L, H, W, F);
    part_masks: optional (L, P, H, W) bool; true_sizes: optional (L, 2)
    valid extents (see dp_min — fused NEG masking of padded cells)."""
    if part_masks is None and true_sizes is None:
        return jax.vmap(lambda x: dp_min(x, comp, compose, dt_impl))(pdfs)
    if true_sizes is None:
        return jax.vmap(
            lambda x, m: dp_min(x, comp, compose, dt_impl, m))(
                pdfs, part_masks)
    if part_masks is None:
        return jax.vmap(
            lambda x, ts: dp_min(x, comp, compose, dt_impl, None, ts))(
                pdfs, true_sizes)
    return jax.vmap(
        lambda x, m, ts: dp_min(x, comp, compose, dt_impl, m, ts))(
            pdfs, part_masks, true_sizes)


# ---------------------------------------------------------------------
# candidate-position argmax recomputation (used by ops/argmax.py)
# ---------------------------------------------------------------------

def _argmax_first(vals: jnp.ndarray, axis: int) -> jnp.ndarray:
    """First-index argmax (ties -> smallest index, like numpy and the
    envelope read-out)."""
    return jnp.argmax(vals, axis=axis).astype(jnp.int32)


def _dt_vals_at(line: jnp.ndarray, w2, w3, pos, off):
    """max/argmax over the last axis of line[c] - w2*d^2 - w3*d with
    d = pos + off - c.  line: (..., N); w2/w3/pos/off: shape
    line.shape[:-1] (or broadcastable).  Returns (max, argmax)."""
    n = line.shape[-1]
    c = jnp.arange(n, dtype=jnp.float32)
    d = (pos + off)[..., None] - c
    w2b = jnp.asarray(w2, jnp.float32)[..., None]
    w3b = jnp.asarray(w3, jnp.float32)[..., None]
    vals = line + (-w2b) * d * d + (-w3b) * d
    return jnp.max(vals, -1), _argmax_first(vals, -1)


def walk_children(res: DPResult, comp: PackedComponent, p: int,
                  mp, py, px, compose: str):
    """Backtracking step for part p: child (x, y, mixture) given the
    parent's (mixture mp, y, x) for a batch of K candidates.

    Recomputes, at the K positions only, the argmaxes the reference
    stored as full tables (src/DynamicProgram.cpp:110-151 +
    include/DistanceTransform.hpp:233-244):
      mc  = argmax over child mixtures of sdt(mc, py, px) + bias;
      then the two 1-D DT argmaxes in the composition order of the
      selected mode ("reference": x from the accumulated-score row at
      parent y — reproducing the quirk that the row-pass table is read
      with parent-y rows — then y from the x-pass column at the
      composed x; "correct": y first from the column at px, then x
      from the row at that y).

    mp/py/px: (K,) int32; returns ((K,) x, y, mc).
    """
    w = comp.defw[p]                        # (M, 4)
    anc = comp.anchor[p].astype(jnp.float32)
    pyf = py.astype(jnp.float32)
    pxf = px.astype(jnp.float32)

    # -- winning child mixture: sdt(mc, py, px) for all mc
    # tmp[p]: (M, H, W); column at px: (M, H, K) -> (M, K, H)
    line = jnp.moveaxis(res.tmp[p][:, :, px], 1, -1)
    sdt_at, _ = _dt_vals_at(
        line, w[:, 2][:, None], w[:, 3][:, None],
        pyf[None, :], anc[:, 1][:, None])             # (M, K)
    weighted = sdt_at + comp.bias[p][:, mp]           # (M, K)
    mc = _argmax_first(weighted, 0)                   # (K,)

    if compose == "reference":
        # x from the accumulated-score row at parent y
        row = res.scores[p][mc, py, :]                # (K, W)
        _, x = _dt_vals_at(row, w[mc, 0], w[mc, 1], pxf, anc[mc, 0])
        # y from the x-pass column at the composed x
        col = res.tmp[p][mc, :, x]                    # (K, H)
        _, y = _dt_vals_at(col, w[mc, 2], w[mc, 3], pyf, anc[mc, 1])
    else:
        # y from the x-pass column at px
        col = res.tmp[p][mc, :, px]                   # (K, H)
        _, y = _dt_vals_at(col, w[mc, 2], w[mc, 3], pyf, anc[mc, 1])
        # x from the accumulated-score row at that y
        row = res.scores[p][mc, y, :]                 # (K, W)
        _, x = _dt_vals_at(row, w[mc, 0], w[mc, 1], pxf, anc[mc, 0])
    return x, y, mc


def composed_tables(res: DPResult, comp: PackedComponent,
                    compose: str = "reference"):
    """Materialize full (P, M, H, W) Ix/Iy/Ik tables (test/debug helper —
    the production path never builds these)."""
    P, M = comp.filterid.shape
    H, W = res.rootv.shape
    yy = jnp.repeat(jnp.arange(H, dtype=jnp.int32), W)
    xx = jnp.tile(jnp.arange(W, dtype=jnp.int32), H)
    Ix = jnp.zeros((P, M, H, W), jnp.int32)
    Iy = jnp.zeros((P, M, H, W), jnp.int32)
    Ik = jnp.zeros((P, M, H, W), jnp.int32)
    for p in range(1, P):
        for m in range(M):
            mp = jnp.full_like(yy, m)
            x, y, mcv = walk_children(res, comp, p, mp, yy, xx, compose)
            Ix = Ix.at[p, m].set(x.reshape(H, W))
            Iy = Iy.at[p, m].set(y.reshape(H, W))
            Ik = Ik.at[p, m].set(mcv.reshape(H, W))
    return Ix, Iy, Ik
