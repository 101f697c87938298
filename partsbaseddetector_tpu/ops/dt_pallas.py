"""Pallas TPU kernel for the generalized (quadratic) distance transform.

The XLA formulation of the 1-D max-transform pass (ops/dt.py) broadcasts
an (N_out, N_in) penalty and max-reduces — two full passes over R*N^2
candidate values with reductions along the lane axis, which lowers well
below VPU peak.  This kernel instead iterates over the DISPLACEMENT
d = q + offset - x:

    for d in [off - (N-1), off + N - 1]:
        cand[q] = src[q + off - d] + (a d^2 + b d)     # lane shift + FMA
        best, bidx updated with >= selects             # ties -> larger d
                                                       # == smaller x

The shifted read is a dynamic lane-slice of a NEG-padded source staged in
VMEM scratch; the penalty is a per-row scalar FMA, so no cross-lane
extraction or reduction appears anywhere — every op is a full-width
(TR, NP) VPU op.  Ties resolve to the smallest x (matching numpy argmax
and the envelope algorithm's read-out, include/DistanceTransform.hpp:
172-178).

Semantics match ops.dt._pass_1d exactly: dst[.., q] = max_x src[.., x]
+ a (q+off-x)^2 + b (q+off-x), idx = first argmax.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from partsbaseddetector_tpu.ops.common import NEG


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dt_pass_kernel(src_ref, a_ref, b_ref, off_ref, out_ref, idx_ref,
                    *, n: int, np_: int, bufw: int, tr: int):
    # NEG-padded shift buffer as a register value: src lives at lane
    # offset [n, n + np_); each loop step rotates it one lane so the
    # current window is always the static slice [:, :np_] (Mosaic
    # requires 128-aligned dynamic lane indexing, so we roll instead)
    neg = jnp.full((tr, bufw), NEG, jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tr, bufw), 1)
    buf = jnp.where((lane >= n) & (lane < n + np_),
                    pltpu.roll(jnp.pad(src_ref[:, :],
                                       ((0, 0), (0, bufw - np_))),
                               n, axis=1),
                    neg)

    a = a_ref[:, :]          # (TR, 1)
    b = b_ref[:, :]
    off = off_ref[:, :]
    qi = jax.lax.broadcasted_iota(jnp.int32, (tr, np_), 1)

    # align so that iteration i sees window start (n-1) - i + n in
    # buffer lanes: cur[q] = buf[q + shift] needs shift = 2n - 1 - i
    buf = pltpu.roll(buf, (-(2 * n - 1)) % bufw, axis=1)

    def body(i, carry):
        best, bidx, cur = carry
        # displacement d = off - (N-1) + i, per row
        d = off + (i - (n - 1)).astype(jnp.float32)        # (TR, 1)
        pen = a * d * d + b * d                            # (TR, 1)
        win = cur[:, :np_]                                 # (TR, NP)
        cand = win + pen
        upd = cand >= best
        best = jnp.where(upd, cand, best)
        # x = q + off - d = q + (N-1) - i, row-independent
        xi = qi + (n - 1 - i)
        bidx = jnp.where(upd, xi, bidx)
        cur = pltpu.roll(cur, 1, axis=1)
        return best, bidx, cur

    init = (jnp.full((tr, np_), -jnp.inf, jnp.float32),
            jnp.zeros((tr, np_), jnp.int32), buf)
    best, bidx, _ = jax.lax.fori_loop(0, 2 * n - 1, body, init)
    out_ref[:, :] = best
    idx_ref[:, :] = jnp.clip(bidx, 0, n - 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dt_pass_pallas(src: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray,
                   off: jnp.ndarray, interpret: bool = False):
    """One 1-D DT pass along the last axis.

    src: (R, N) float32; a, b, off: (R,) per-row penalty parameters
    (off integer-valued, float ok).  Returns (out, idx) each (R, N)."""
    R, N = src.shape
    TR = 8
    NP = _round_up(N, 128)
    RP = _round_up(R, TR)
    BUFW = _round_up(N + NP + N, 128)

    srcp = jnp.full((RP, NP), NEG, jnp.float32)
    srcp = srcp.at[:R, :N].set(src.astype(jnp.float32))
    ap = jnp.zeros((RP, 1), jnp.float32).at[:R, 0].set(
        a.astype(jnp.float32))
    bp = jnp.zeros((RP, 1), jnp.float32).at[:R, 0].set(
        b.astype(jnp.float32))
    op = jnp.zeros((RP, 1), jnp.float32).at[:R, 0].set(
        off.astype(jnp.float32))

    kernel = functools.partial(_dt_pass_kernel, n=N, np_=NP, bufw=BUFW,
                               tr=TR)
    out, idx = pl.pallas_call(
        kernel,
        grid=(RP // TR,),
        in_specs=[
            pl.BlockSpec((TR, NP), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TR, NP), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, NP), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((RP, NP), jnp.float32),
            jax.ShapeDtypeStruct((RP, NP), jnp.int32),
        ],
        interpret=interpret,
    )(srcp, ap, bp, op)
    return out[:R, :N], idx[:R, :N]


def distance_transform_raw_pallas(score: jnp.ndarray, w: jnp.ndarray,
                                  anchor: jnp.ndarray,
                                  interpret: bool = False):
    """Drop-in Pallas version of ops.dt.distance_transform_raw for one
    (H, W) score map; w: (4,), anchor: (2,)."""
    H, W = score.shape
    tmp, ix_row = dt_pass_pallas(
        score, -w[0][None].repeat(H), -w[1][None].repeat(H),
        anchor[0].astype(jnp.float32)[None].repeat(H),
        interpret=interpret)
    out_t, iy_col_t = dt_pass_pallas(
        tmp.T, -w[2][None].repeat(W), -w[3][None].repeat(W),
        anchor[1].astype(jnp.float32)[None].repeat(W),
        interpret=interpret)
    return out_t.T, ix_row, iy_col_t.T


def dt_mixtures_raw_pallas(scores: jnp.ndarray, defw: jnp.ndarray,
                           anchors: jnp.ndarray,
                           interpret: bool = False):
    """Pallas counterpart of ops.dt.dt_mixtures_raw: scores (M, H, W),
    defw (M, 4), anchors (M, 2) -> (out, ix_row, iy_col) each (M, H, W).
    The mixture and row axes are collapsed into the kernel's R axis (one
    launch per pass instead of per mixture)."""
    M, H, W = scores.shape
    # x pass: rows are (m, y), length W
    a1 = jnp.repeat(-defw[:, 0], H)
    b1 = jnp.repeat(-defw[:, 1], H)
    o1 = jnp.repeat(anchors[:, 0].astype(jnp.float32), H)
    tmp, ix_row = dt_pass_pallas(scores.reshape(M * H, W), a1, b1, o1,
                                 interpret=interpret)
    tmp = tmp.reshape(M, H, W)
    ix_row = ix_row.reshape(M, H, W)
    # y pass: rows are (m, x), length H
    a2 = jnp.repeat(-defw[:, 2], W)
    b2 = jnp.repeat(-defw[:, 3], W)
    o2 = jnp.repeat(anchors[:, 1].astype(jnp.float32), W)
    tmp_t = jnp.swapaxes(tmp, 1, 2).reshape(M * W, H)
    out_t, iy_col_t = dt_pass_pallas(tmp_t, a2, b2, o2,
                                     interpret=interpret)
    out = jnp.swapaxes(out_t.reshape(M, W, H), 1, 2)
    iy_col = jnp.swapaxes(iy_col_t.reshape(M, W, H), 1, 2)
    return out, ix_row, iy_col
