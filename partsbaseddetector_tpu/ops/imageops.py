"""Image resampling ops with OpenCV semantics, built for static padded
buffers with dynamic valid sizes.

The reference's pyramid ladder uses cv::resize (INTER_LINEAR) and
cv::pyrDown (reference: src/HOGFeatures.cpp:111-127).  On TPU we express
both as separable sampling-matrix products: ``out = Ry @ im @ Rx^T``.  The
sampling matrices are built on-device from (possibly traced) true sizes, so
one compiled program serves every pyramid level of a shape bucket; the
matrices are tiny relative to the downstream filter-bank conv and map
straight onto the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp

from partsbaseddetector_tpu.ops.common import DEFAULT_DTYPE, PRECISION


def _bilinear_matrix(n_out_pad: int, n_in_pad: int, n_out, n_in,
                     dtype=DEFAULT_DTYPE) -> jnp.ndarray:
    """(n_out_pad, n_in_pad) bilinear sampling matrix for OpenCV
    INTER_LINEAR: src coord of dst i is (i + 0.5) * (n_in / n_out) - 0.5,
    edge-clamped.  n_out / n_in may be traced scalars; rows >= n_out and
    cols >= n_in are zeroed."""
    n_out_f = jnp.asarray(n_out, dtype)
    n_in_f = jnp.asarray(n_in, dtype)
    i = jnp.arange(n_out_pad, dtype=dtype)
    f = (i + 0.5) * (n_in_f / n_out_f) - 0.5
    i0 = jnp.floor(f)
    frac = f - i0
    frac = jnp.where(i0 < 0, 0.0, frac)
    i0c = jnp.clip(i0, 0, n_in_f - 1.0)
    frac = jnp.where(i0c >= n_in_f - 1.0, 0.0, frac)
    i1c = jnp.clip(i0c + 1.0, 0.0, n_in_f - 1.0)

    j = jnp.arange(n_in_pad, dtype=dtype)
    m = ((j[None, :] == i0c[:, None]) * (1.0 - frac[:, None])
         + (j[None, :] == i1c[:, None]) * frac[:, None])
    # when i0c == i1c (edge), both terms hit the same j: weights sum to 1
    row_valid = (i < n_out_f)[:, None]
    col_valid = (j < n_in_f)[None, :]
    return (m * row_valid * col_valid).astype(dtype)


def resize_linear(im: jnp.ndarray, out_pad: tuple, out_size, in_size=None,
                  dtype=DEFAULT_DTYPE) -> jnp.ndarray:
    """OpenCV INTER_LINEAR resize into a padded buffer.

    im: (H_pad, W_pad[, C]) with valid region in_size=(h, w) (defaults to
    the full buffer); out_pad: static padded output shape (Oh, Ow);
    out_size: true (dynamic) output size (oh, ow).  Region beyond (oh, ow)
    is zero."""
    H, W = im.shape[:2]
    if in_size is None:
        in_size = (H, W)
    Ry = _bilinear_matrix(out_pad[0], H, out_size[0], in_size[0], dtype)
    Rx = _bilinear_matrix(out_pad[1], W, out_size[1], in_size[1], dtype)
    x = im.astype(dtype)
    if x.ndim == 2:
        return jnp.einsum("oh,hw,pw->op", Ry, x, Rx,
                      precision=PRECISION)
    return jnp.einsum("oh,hwc,pw->opc", Ry, x, Rx,
                      precision=PRECISION)


def _reflect101(idx: jnp.ndarray, n) -> jnp.ndarray:
    """BORDER_REFLECT_101 folding with traced size n (n >= 2)."""
    period = 2 * (n - 1)
    idx = jnp.abs(idx) % period
    return jnp.where(idx >= n, period - idx, idx)


def _pyrdown_matrix(n_out_pad: int, n_in_pad: int, n_in,
                    dtype=DEFAULT_DTYPE) -> jnp.ndarray:
    """(n_out_pad, n_in_pad) matrix implementing the 1-D 5-tap binomial
    [1,4,6,4,1]/16 blur + decimate-by-2 with BORDER_REFLECT_101, output
    size ceil(n_in / 2) (reference pyrDown semantics).  n_in may be
    traced."""
    k = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0], dtype) / 16.0
    n_in_i = jnp.asarray(n_in, jnp.int32)
    n_out = (n_in_i + 1) // 2
    y = jnp.arange(n_out_pad, dtype=jnp.int32)
    j = jnp.arange(n_in_pad, dtype=jnp.int32)
    m = jnp.zeros((n_out_pad, n_in_pad), dtype)
    for t in range(5):
        src = _reflect101(2 * y + t - 2, n_in_i)
        m = m + k[t] * (j[None, :] == src[:, None]).astype(dtype)
    row_valid = (y < n_out)[:, None]
    col_valid = (j < n_in_i)[None, :]
    return m * row_valid * col_valid


def pyr_down(im: jnp.ndarray, out_pad: tuple, in_size,
             dtype=DEFAULT_DTYPE) -> jnp.ndarray:
    """OpenCV pyrDown into a padded buffer.  im: (H_pad, W_pad[, C]) with
    valid region in_size=(h, w); output valid region is (ceil(h/2),
    ceil(w/2)), zeros beyond."""
    H, W = im.shape[:2]
    Py = _pyrdown_matrix(out_pad[0], H, in_size[0], dtype)
    Px = _pyrdown_matrix(out_pad[1], W, in_size[1], dtype)
    x = im.astype(dtype)
    if x.ndim == 2:
        return jnp.einsum("oh,hw,pw->op", Py, x, Px,
                      precision=PRECISION)
    return jnp.einsum("oh,hwc,pw->opc", Py, x, Px,
                      precision=PRECISION)
