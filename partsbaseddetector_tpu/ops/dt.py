"""Generalized (quadratic) distance transform on TPU.

The reference computes, per part mixture, a separable max-transform
  out[py, px] = max_{cy, cx} score[cy, cx] - w0 dx^2 - w1 dx - w2 dy^2
                                            - w3 dy,
  dx = (px + ax) - cx,  dy = (py + ay) - cy
via the O(N) lower-envelope algorithm
(reference: include/DistanceTransform.hpp:152-182, invoked with negated
weights at src/DynamicProgram.cpp:125-128).

The envelope algorithm is sequential per row.  On TPU the profitable
formulation is the dense separable max-plus contraction: for each of the
two passes, broadcast a (N_out, N_in) quadratic penalty matrix against the
rows and max-reduce — pure VPU work with perfect parallelism over rows x
mixtures x parts x levels, no sequential dependency, and XLA fuses the
broadcast+reduce so the (R, N, N) intermediate never materializes in HBM.
An O(N*K) windowed variant (quadratic growth bounds the useful
displacement) and a Pallas envelope kernel are the escalation path.

Argmin-table composition replicates the reference quirk exactly
(include/DistanceTransform.hpp:233-244; see oracle.reference.
distance_transform): compose="reference" leaves the row-pass table
indexed by child-y rows and gathers Iy through it; compose="correct"
is the textbook composition.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from partsbaseddetector_tpu.ops.common import DEFAULT_DTYPE


def _penalty_matrix(n: int, a, b, offset, dtype=DEFAULT_DTYPE):
    """(n_out, n_in) matrix P[q, x'] = -a*d^2 - b*d with d = q + offset
    - x'.  a, b, offset may be traced scalars."""
    q = jnp.arange(n, dtype=dtype)[:, None]
    x = jnp.arange(n, dtype=dtype)[None, :]
    d = q + jnp.asarray(offset, dtype) - x
    return -jnp.asarray(a, dtype) * d * d - jnp.asarray(b, dtype) * d


def dt_max_1d_last(src: jnp.ndarray, w0, w1, offset):
    """Max-only 1-D DT pass along the last axis (no argmax — the DP
    forward scan stores only maxima; argmaxes are recomputed per
    candidate in ops/dp.walk_children).

    dst[.., q] = max_x src[.., x] - w0 d^2 - w1 d, d = q + offset - x."""
    n = src.shape[-1]
    pen = _penalty_matrix(n, w0, w1, offset, src.dtype)
    return jnp.max(src[..., None, :] + pen, axis=-1)


def dt_max_x(src: jnp.ndarray, w0, w1, ax):
    """Max-only x pass over (..., H, W) maps, TPU-tiled: the candidate
    tensor is laid out (..., H, Cx, Q) so the reduction runs over the
    SUBLANE axis while the output position q stays on lanes — on TPU
    this lowers several times faster than a lane-axis reduce and needs
    no transposes (the profiler attributed ~25% of detect's device time
    to lane reduces + layout copies of the transpose formulation).

    out[..., h, q] = max_cx src[..., h, cx] - w0 d^2 - w1 d,
    d = q + ax - cx.  Identical values to dt_max_1d_last."""
    n = src.shape[-1]
    dtype = src.dtype
    q = jnp.arange(n, dtype=dtype)[None, :]
    cx = jnp.arange(n, dtype=dtype)[:, None]
    d = q + jnp.asarray(ax, dtype) - cx                  # (Cx, Q)
    pen = -jnp.asarray(w0, dtype) * d * d - jnp.asarray(w1, dtype) * d
    cand = src[..., :, None] + pen                       # (..., H, Cx, Q)
    return jnp.max(cand, axis=-2)


def dt_max_y(src: jnp.ndarray, w2, w3, ay):
    """Max-only y pass over (..., H, W) maps without transposing: the
    candidate tensor is (..., Py, Cy, Px) — reduction over sublanes,
    columns px on lanes.

    out[..., py, px] = max_cy src[..., cy, px] - w2 d^2 - w3 d,
    d = py + ay - cy."""
    h = src.shape[-2]
    dtype = src.dtype
    py = jnp.arange(h, dtype=dtype)[:, None]
    cy = jnp.arange(h, dtype=dtype)[None, :]
    d = py + jnp.asarray(ay, dtype) - cy                 # (Py, Cy)
    pen = -jnp.asarray(w2, dtype) * d * d - jnp.asarray(w3, dtype) * d
    cand = src[..., None, :, :] + pen[..., :, :, None]   # (..., Py, Cy, Px)
    return jnp.max(cand, axis=-2)


def _pass_1d(src: jnp.ndarray, a, b, offset):
    """One 1-D max-transform pass along the last axis.
    src: (..., R, N).  Returns (dst, argmax) each (..., R, N) where
    dst[..., q] = max_x src[..., x] + P[q, x].

    The argmax is computed as max + masked-iota max rather than a
    variadic (value, index) reduce: on TPU the variadic argmax lowering
    runs ~5x slower than two plain max reduces over the same fused
    candidate expression.  Ties resolve to the smallest x (matching
    numpy argmax and the envelope algorithm's tie behavior)."""
    n = src.shape[-1]
    pen = _penalty_matrix(n, a, b, offset, src.dtype)      # (Nq, Nx)
    cand = src[..., None, :] + pen                          # (..., Nq, Nx)
    dst = jnp.max(cand, axis=-1)
    iota = jnp.arange(n, dtype=jnp.int32)
    # recomputing cand in this second fusion yields bitwise-identical
    # values (same expression), so >= hits exactly the max elements
    rev = jnp.where(cand >= dst[..., None], n - 1 - iota,
                    jnp.int32(-1))
    idx = (n - 1) - jnp.max(rev, axis=-1)
    return dst, idx.astype(jnp.int32)


def distance_transform_raw(score: jnp.ndarray, w: jnp.ndarray,
                           anchor: jnp.ndarray):
    """2-D generalized distance transform, raw pass tables.

    score: (M, N); w: (4,); anchor: (2,) (ax, ay).
    Returns (out, ix_row, iy_col), each (M, N):
      out[py, px]    - the max-transformed score
      ix_row[cy, px] - x-pass argmax (rows indexed by CHILD y)
      iy_col[py, px] - y-pass argmax

    The argmin-table *composition* (reference: include/DistanceTransform.
    hpp:233-244) is deliberately deferred to backtracking time: composing
    here costs an (H, W)-sized per-element gather per part per mixture —
    catastrophic on TPU — while at backtrack time it is one extra
    K-element gather per part (ops/argmax.py)."""
    ax = anchor[0]
    ay = anchor[1]
    tmp, ix_row = _pass_1d(score, w[0], w[1], ax)           # (M, N)
    out_t, iy_col_t = _pass_1d(tmp.T, w[2], w[3], ay)       # (N, M)
    return out_t.T, ix_row, iy_col_t.T


@partial(jax.jit, static_argnames=("compose",))
def distance_transform(score: jnp.ndarray, w: jnp.ndarray,
                       anchor: jnp.ndarray, compose: str = "reference"):
    """Full DT with composed argmax tables (reference semantics; used by
    tests and small-scale paths — the production DP keeps raw tables).

    Returns (out, Ix, Iy) each (M, N) indexed [parent_y, parent_x]."""
    out, ix_row, iy_col = distance_transform_raw(score, w, anchor)
    if compose == "reference":
        ix = ix_row
        iy = jnp.take_along_axis(iy_col, ix_row, axis=1)
    elif compose == "correct":
        iy = iy_col
        ix = jnp.take_along_axis(ix_row, iy_col, axis=0)
    else:
        raise ValueError(compose)
    return out, ix, iy


def dt_mixtures_raw(scores: jnp.ndarray, defw: jnp.ndarray,
                    anchors: jnp.ndarray):
    """vmapped raw DT over the mixture axis.  scores: (M_mix, H, W)."""
    return jax.vmap(distance_transform_raw)(scores, defw, anchors)


# --------------------------------------------------------------------------
# shifted / strided DT — the multi-resolution message-passing kernel
# --------------------------------------------------------------------------

def _shiftdt_pass(src: jnp.ndarray, a, b, shift, dlen: int, step):
    """One shifted/strided 1-D max-transform pass along the last axis.

    dst[..., i] = max_x src[..., x] - a d^2 - b d,  d = shift + i*step - x
    (output grid positions q_i = shift + i*step on the SOURCE grid).
    Returns (dst, argmax) of shapes (..., dlen); argmax resolves ties to
    the smallest source index."""
    n = src.shape[-1]
    q = jnp.asarray(shift, src.dtype) + \
        jnp.arange(dlen, dtype=src.dtype) * jnp.asarray(step, src.dtype)
    d = q[:, None] - jnp.arange(n, dtype=src.dtype)[None, :]
    pen = -jnp.asarray(a, src.dtype) * d * d \
        - jnp.asarray(b, src.dtype) * d                  # (dlen, n)
    cand = src[..., None, :] + pen                       # (..., dlen, n)
    dst = jnp.max(cand, axis=-1)
    iota = jnp.arange(n, dtype=jnp.int32)
    rev = jnp.where(cand >= dst[..., None], n - 1 - iota, jnp.int32(-1))
    idx = (n - 1) - jnp.max(rev, axis=-1)
    return dst, idx.astype(jnp.int32)


def shiftdt_max_y(src: jnp.ndarray, w2, w3, starty, leny: int, step):
    """Max-only strided y pass: src (..., H, W) ->
    out[..., i, px] = max_cy src[..., cy, px] - w2 d^2 - w3 d,
    d = starty + i*step - cy.  Sublane reduction, px on lanes
    (see dt_max_y)."""
    h = src.shape[-2]
    dtype = src.dtype
    py = jnp.arange(leny, dtype=dtype)[:, None]
    cy = jnp.arange(h, dtype=dtype)[None, :]
    d = jnp.asarray(starty, dtype) + py * jnp.asarray(step, dtype) - cy
    pen = -jnp.asarray(w2, dtype) * d * d - jnp.asarray(w3, dtype) * d
    cand = src[..., None, :, :] + pen[..., :, :, None]  # (.., Py, Cy, Px)
    return jnp.max(cand, axis=-2)


def shiftdt_max_x(src: jnp.ndarray, w0, w1, startx, lenx: int, step):
    """Max-only strided x pass: src (..., H, W) ->
    out[..., h, j] = max_cx src[..., h, cx] - w0 d^2 - w1 d,
    d = startx + j*step - cx.  Sublane reduction (see dt_max_x)."""
    n = src.shape[-1]
    dtype = src.dtype
    q = jnp.arange(lenx, dtype=dtype)[None, :]
    cx = jnp.arange(n, dtype=dtype)[:, None]
    d = jnp.asarray(startx, dtype) + q * jnp.asarray(step, dtype) - cx
    pen = -jnp.asarray(w0, dtype) * d * d - jnp.asarray(w1, dtype) * d
    cand = src[..., :, None] + pen                      # (.., H, Cx, Q)
    return jnp.max(cand, axis=-2)


def shiftdt_max(src: jnp.ndarray, w: jnp.ndarray, startx, starty,
                lenx: int, leny: int, step=1):
    """Max-only forward pass of :func:`shiftdt` (the multi-resolution
    DP's message op): y pass first (matlab kernel order,
    matlab/oct/shiftdt.cc:97-102), then x.

    Returns (out, tmp): out (..., leny, lenx) message on the parent
    grid; tmp (..., leny, W) y-pass maxima (kept for the K-point argmax
    recomputation at backtrack time, see infer/multires.py)."""
    w = jnp.asarray(w)
    tmp = shiftdt_max_y(src, w[..., 2], w[..., 3], starty, leny, step)
    out = shiftdt_max_x(tmp, w[..., 0], w[..., 1], startx, lenx, step)
    return out, tmp


def shiftdt(score: jnp.ndarray, w: jnp.ndarray, startx, starty,
            lenx: int, leny: int, step=1):
    """Generalized DT on a shifted, subsampled output grid — the
    message-passing kernel for parts at DIFFERENT pyramid resolutions
    (child at a finer level than its parent), a capability of the Matlab
    detector (reference: matlab/oct/shiftdt.cc:17-52, used by passmsg at
    matlab/detection/detect.m:230-245 with step = 2^ds and virtual-padding
    start offsets) that the C++ port dropped (its DT fixes step == 1,
    include/DistanceTransform.hpp:152-182).

    score: (H, W) child score map; w = (w0, w1, w2, w3) deformation
    penalty (x-quadratic, x-linear, y-quadratic, y-linear, all >= 0 for a
    true penalty); startx/starty: 0-based position on the child grid of
    the parent's (0, 0) cell; step: child cells per parent cell.

    Output grid: child position (starty + i*step, startx + j*step) for
    parent cell (i, j), i < leny, j < lenx.

    Computes the y pass first, then x — the Matlab kernel's order
    (shiftdt.cc:97-102; the C++ engine runs x first) — and composes the
    argmax tables exactly like the mex kernel (shiftdt.cc:105-111,
    0-based): Iy[i, j] = IyCol[i, Ix[i, j]].

    Returns (out, Ix, Iy), each (leny, lenx); Ix/Iy are child-grid
    coordinates.  Dense O(N * dlen) per pass — on TPU the broadcast+reduce
    formulation (see module docstring) beats the sequential envelope."""
    w = jnp.asarray(w)
    # y pass: columns of score, output rows at starty + i*step
    tmp_t, iy_t = _shiftdt_pass(score.T, w[2], w[3], starty, leny, step)
    tmp = tmp_t.T                                        # (leny, W)
    iy_col = iy_t.T                                      # (leny, W)
    # x pass: rows of tmp, output cols at startx + j*step
    out, ix = _shiftdt_pass(tmp, w[0], w[1], startx, lenx, step)
    iy = jnp.take_along_axis(iy_col, ix, axis=1)
    return out, ix, iy
