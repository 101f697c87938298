"""Fused Pallas kernel for the K-point backtracking walk.

The XLA backtracking path (ops/argmax.backtrack + ops/dp.walk_children)
unrolls the root-to-leaf pointer walk over parts, each part issuing ~3
line-gathers plus small argmax reductions.  At production shapes that
is ~1,350 tiny (1-2 KB) device ops per batch dispatch — measured
launch-bound at ~8-12 ms of the 33 ms/frame device time (PERF.md
§backtrack).  This kernel fuses the ENTIRE walk for all levels and all
parts of one (bucket, group, component) program into a single
`pallas_call`:

  * grid (L, P-1): levels major, parts minor — the TPU grid executes
    sequentially, so a VMEM scratch buffer carries each level's partial
    walk state (X/Y/mixture per part) across part steps; parents are
    stored root-first (parent < child), so a part's parent row is
    always written before it is read;
  * per step, the pipeline DMAs only that (level, part)'s (M, H, W)
    score/tmp blocks into VMEM (~0.3 MB each at the largest bucket);
  * the per-candidate line gathers become ONE-HOT MXU dot products —
    exact in f32 (`precision=highest` splits each f32 into two bf16
    terms; against a 0/1 one-hot matrix each value is reproduced as
    hi*1 + lo*1 with no rounding), so results are bit-identical to the
    XLA gather path;
  * argmax tie-breaking is first-wins (`jnp.argmax`), matching
    ops/dp._argmax_first.

Semantics replicated exactly (both composition modes): the child
mixture from the y-pass value at the parent position plus the pairwise
bias (reference: src/DynamicProgram.cpp:134-151), then the two 1-D DT
argmax recomputations in the selected order (reference quirk:
include/DistanceTransform.hpp:233-244; see ops/dp.walk_children).

On non-TPU backends the kernel runs in interpreter mode (tests), and
the Detector defaults to the XLA walk there; on TPU the fused walk is
the default (see infer/detector.Detector walk_impl).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _onehot(idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """(K,) int32 -> (K, n) f32 one-hot (2-D iota, TPU-safe)."""
    k = idx.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (k, n), 1)
    return (cols == idx[:, None]).astype(jnp.float32)


def _argmax_first(vals: jnp.ndarray, axis: int) -> jnp.ndarray:
    return jnp.argmax(vals, axis=axis).astype(jnp.int32)


def _walk_kernel(parent_ref,                    # SMEM (P,)
                 scores_ref, tmp_ref,           # VMEM (1, 1, M, H, W)
                 xs_ref, ys_ref, mv_ref,        # VMEM (L, K), unblocked
                 defw_ref, anc_ref, bias_ref,   # VMEM (1, M, {4,2,M})
                 x_out, y_out, m_out,           # VMEM (L, P-1, K), unblk
                 xs_s, ys_s, ms_s,              # scratch VMEM (P, K)
                 *, compose: str):
    l = pl.program_id(0)
    p_idx = pl.program_id(1)
    p = p_idx + 1

    # seed the root row once per level (parent[1] == 0 always: parts
    # are root-first topological, so row 0 is read first at p == 1)
    @pl.when(p_idx == 0)
    def _():
        xs_s[0, :] = xs_ref[pl.ds(l, 1), :][0]
        ys_s[0, :] = ys_ref[pl.ds(l, 1), :][0]
        ms_s[0, :] = mv_ref[pl.ds(l, 1), :][0]

    par = parent_ref[p]
    px = xs_s[pl.ds(par, 1), :][0]               # (K,) int32
    py = ys_s[pl.ds(par, 1), :][0]
    mp = ms_s[pl.ds(par, 1), :][0]

    scores = scores_ref[0, 0]                    # (M, H, W) f32
    tmp = tmp_ref[0, 0]
    M, H, W = scores.shape
    K = px.shape[0]
    defw = defw_ref[0]                           # (M, 4)
    anc = anc_ref[0]                             # (M, 2) f32
    bias = bias_ref[0]                           # (Mc, Mp)

    pxf = px.astype(jnp.float32)
    pyf = py.astype(jnp.float32)
    oh_px = _onehot(px, W)                       # (K, W)
    oh_mp = _onehot(mp, M)                       # (K, M)

    # Mosaic's tpu.iota is integer-only: build int32, cast to f32
    hi = jax.lax.broadcasted_iota(jnp.int32, (M, H, K), 1).astype(
        jnp.float32)

    # ---- child mixture: sdt(mc, py, px) + bias[mc, mp], argmax mc
    # T1[m*h, k] = tmp[m, h, px_k]  (exact one-hot dot)
    t1 = jax.lax.dot_general(
        tmp.reshape(M * H, W), oh_px,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32).reshape(M, H, K)
    dy = (pyf[None, None, :] + anc[:, 1][:, None, None]) - hi
    vals = t1 + (-defw[:, 2][:, None, None]) * dy * dy \
        + (-defw[:, 3][:, None, None]) * dy          # (M, H, K)
    sdt_at = jnp.max(vals, axis=1)                   # (M, K)
    # bias[:, mp_k] via one-hot over the parent-mixture axis
    bsel = jax.lax.dot_general(
        bias, oh_mp, dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)          # (Mc, K)
    mc = _argmax_first(sdt_at + bsel, 0)             # (K,)

    oh_mc = _onehot(mc, M)                           # (K, M)

    def _sel(vec):
        # (M,) -> (K,): one-hot masked VPU sum.  NOT a matmul: a plain
        # `@` here would run at default MXU precision, rounding the f32
        # deformation weights to bf16 on real TPU (the documented
        # parity-breaking behavior) — the mask-multiply-sum is exact.
        return jnp.sum(oh_mc * vec[None, :], axis=1)

    w2x = _sel(defw[:, 0])                           # (K,)
    w3x = _sel(defw[:, 1])
    w2y = _sel(defw[:, 2])
    w3y = _sel(defw[:, 3])
    ancx = _sel(anc[:, 0])
    ancy = _sel(anc[:, 1])

    def row_argmax(row, w2, w3, pos, off):
        # row (K, N): argmax_n row + (-w2)*d^2 + (-w3)*d, d = pos+off-n
        ni = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1).astype(
            jnp.float32)
        d = (pos + off)[:, None] - ni
        v = row + (-w2)[:, None] * d * d + (-w3)[:, None] * d
        return _argmax_first(v, 1)

    if compose == "reference":
        # x from the accumulated-score row at PARENT y (the C++ DT
        # compose quirk), then y from the x-pass column at that x
        oh_mh = _onehot(mc * H + py, M * H)          # (K, M*H)
        row = jax.lax.dot_general(
            oh_mh, scores.reshape(M * H, W),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)      # (K, W)
        x = row_argmax(row, w2x, w3x, pxf, ancx)

        oh_x = _onehot(x, W)
        t2 = jax.lax.dot_general(
            tmp.reshape(M * H, W), oh_x,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32).reshape(M, H, K)
        col = jnp.sum(t2 * oh_mc.T[:, None, :], axis=0)   # (H, K)
        y = row_argmax(col.T, w2y, w3y, pyf, ancy)
    else:
        # "correct": y from the x-pass column at px, then x from the
        # accumulated-score row at that y
        col = jnp.sum(t1 * oh_mc.T[:, None, :], axis=0)   # (H, K)
        y = row_argmax(col.T, w2y, w3y, pyf, ancy)

        oh_mh = _onehot(mc * H + y, M * H)
        row = jax.lax.dot_general(
            oh_mh, scores.reshape(M * H, W),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        x = row_argmax(row, w2x, w3x, pxf, ancx)

    xs_s[pl.ds(p, 1), :] = x[None]
    ys_s[pl.ds(p, 1), :] = y[None]
    ms_s[pl.ds(p, 1), :] = mc[None]
    x_out[pl.ds(l, 1), pl.ds(p_idx, 1), :] = x[None, None]
    y_out[pl.ds(l, 1), pl.ds(p_idx, 1), :] = y[None, None]
    m_out[pl.ds(l, 1), pl.ds(p_idx, 1), :] = mc[None, None]


@functools.partial(jax.jit, static_argnames=("compose", "interpret"))
def walk_tree_pallas(scores: jnp.ndarray, tmp: jnp.ndarray,
                     xs: jnp.ndarray, ys: jnp.ndarray, mv: jnp.ndarray,
                     defw: jnp.ndarray, anchor: jnp.ndarray,
                     bias: jnp.ndarray, parent: jnp.ndarray,
                     compose: str = "reference",
                     interpret: bool = False):
    """Fused walk for one (bucket, group, component).

    scores/tmp: (L, P, M, H, W) f32 (DPResult fields, vmapped over
    levels); xs/ys/mv: (L, K) int32 root seeds; defw (P, M, 4) f32;
    anchor (P, M, 2) f32; bias (P, M, M) f32; parent (P,) int32.
    Returns (X, Y, Mm) each (L, P, K) int32 (part 0 = the seeds).
    """
    L, P, M, H, W = scores.shape
    K = xs.shape[1]
    if P == 1:
        return (xs[:, None, :], ys[:, None, :], mv[:, None, :])

    kern = functools.partial(_walk_kernel, compose=compose)
    grid = (L, P - 1)
    # index maps take (*grid_ids, *scalar_prefetch_refs).  Mosaic
    # requires block last-two dims divisible by (8, 128) or equal to
    # the array dims: the big score/tmp arrays block per (level, part)
    # with full (H, W) planes; the small seed/output/param arrays ride
    # whole in VMEM (constant index map) and are indexed in-kernel.
    blk_scores = pl.BlockSpec((1, 1, M, H, W),
                              lambda l, p, *_: (l, p + 1, 0, 0, 0))
    blk_seed = pl.BlockSpec((L, K), lambda l, p, *_: (0, 0))
    blk_param = lambda n: pl.BlockSpec(
        (1, M, n), lambda l, p, *_: (p + 1, 0, 0))
    blk_out = pl.BlockSpec((L, P - 1, K), lambda l, p, *_: (0, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,          # parent (P,) in SMEM
        grid=grid,
        in_specs=[
            blk_scores, blk_scores,
            blk_seed, blk_seed, blk_seed,
            blk_param(4), blk_param(2), blk_param(M),
        ],
        out_specs=[blk_out] * 3,
        scratch_shapes=[pltpu.VMEM((P, K), jnp.int32)] * 3,
    )
    out_shape = [jax.ShapeDtypeStruct((L, P - 1, K), jnp.int32)] * 3
    x_w, y_w, m_w = pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
    )(parent.astype(jnp.int32),
      scores.astype(jnp.float32), tmp.astype(jnp.float32),
      xs.astype(jnp.int32), ys.astype(jnp.int32), mv.astype(jnp.int32),
      defw.astype(jnp.float32), anchor.astype(jnp.float32),
      bias.astype(jnp.float32))
    X = jnp.concatenate([xs[:, None, :], x_w], axis=1)
    Y = jnp.concatenate([ys[:, None, :], y_w], axis=1)
    Mm = jnp.concatenate([mv[:, None, :], m_w], axis=1)
    return X, Y, Mm
