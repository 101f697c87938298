"""Felzenszwalb HOG features as batched TPU ops.

Re-design of the reference's per-pixel scalar loops
(reference: src/HOGFeatures.cpp:167-341) into vectorized XLA ops:

  * gradients / channel-pick / orientation snapping: elementwise VPU work
    with the reference's exact tie-break order reproduced;
  * bilinear cell binning: instead of scatter-adds (slow on TPU), the tent
    interpolation is expressed as two small sampling-matrix products
    ``hist = By @ mag_o @ Bx^T`` per orientation — a dense MXU-friendly
    formulation that is mathematically identical to the reference's
    4-neighbor scatter (each pixel contributes tent(y)*tent(x) to the
    2x2 surrounding cells);
  * block-energy normalization and feature assembly: elementwise.

All functions take static padded buffer sizes plus (possibly traced)
dynamic true sizes, so one compiled kernel serves every pyramid level of a
shape bucket.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from partsbaseddetector_tpu.ops.common import DEFAULT_DTYPE, PRECISION

# unit vectors for the 18-way orientation snap
# (reference: src/HOGFeatures.cpp:192-193)
_UU = np.array([1.000, 0.9397, 0.7660, 0.5000, 0.1736,
                -0.1736, -0.5000, -0.7660, -0.9397])
_VV = np.array([0.000, 0.3420, 0.6428, 0.8660, 0.9848,
                0.9848, 0.8660, 0.6428, 0.3420])


def hog_output_shape(imsize, binsize: int):
    """(blocks_h, blocks_w, out_h, out_w) for a true image size; mirrors
    round(size/binsize) and max(blocks-2, 0)
    (reference: src/HOGFeatures.cpp:174-175)."""
    h, w = imsize
    bh = int(np.floor(h / binsize + 0.5))
    bw = int(np.floor(w / binsize + 0.5))
    return bh, bw, max(bh - 2, 0), max(bw - 2, 0)


def _blocks(n, binsize):
    """round(n / binsize) with round-half-up, traced-size safe."""
    return jnp.floor(jnp.asarray(n, DEFAULT_DTYPE) / binsize + 0.5
                     ).astype(jnp.int32)


def _tent_matrix(nblocks_pad: int, npix_pad: int, binsize: int, nblocks,
                 vis, true_n, dtype=DEFAULT_DTYPE) -> jnp.ndarray:
    """(nblocks_pad, npix_pad) matrix B with
    B[c, y] = max(0, 1 - |(y+0.5)/binsize - 0.5 - c|) for pixels y in the
    reference's loop range [1, vis-1) and cells c < nblocks; zero
    elsewhere.  This reproduces the bilinear scatter
    (reference: src/HOGFeatures.cpp:251-265) as a gather."""
    c = jnp.arange(nblocks_pad, dtype=dtype)[:, None]
    y = jnp.arange(npix_pad, dtype=dtype)[None, :]
    t = (y + 0.5) / binsize - 0.5 - c
    w = jnp.maximum(0.0, 1.0 - jnp.abs(t))
    nblocks_f = jnp.asarray(nblocks, dtype)
    vis_f = jnp.asarray(vis, dtype)
    w = w * (c < nblocks_f)
    w = w * ((y >= 1) & (y <= vis_f - 2))
    del true_n
    return w.astype(dtype)


def hog_features(im: jnp.ndarray, binsize: int, norient: int, flen: int,
                 true_size=None, feat_pad=None,
                 dtype=DEFAULT_DTYPE) -> jnp.ndarray:
    """HOG features of one (padded) image.

    im: (H_pad, W_pad) grayscale or (H_pad, W_pad, 3) RGB, any real dtype
        (float pixel path; the reference's uint8 path differs only by
        OpenCV's fixed-point resize quantization upstream).
    true_size: true (h, w) (traced ok); defaults to the buffer size.
    feat_pad: static padded output spatial shape (fh, fw); defaults to the
        exact output size for the buffer size (requires static true_size).

    Returns (fh, fw, flen); entries beyond the true output size are zero,
    the truncation channel (flen-1) is zero everywhere
    (reference: src/HOGFeatures.cpp:338).
    """
    assert flen == 3 * norient // 2 + 5, (flen, norient)
    half = norient // 2
    H, W = im.shape[:2]
    if true_size is None:
        true_size = (H, W)
    h, w = true_size

    if feat_pad is None:
        bh_s, bw_s, oh_s, ow_s = hog_output_shape((int(h), int(w)), binsize)
        feat_pad = (oh_s, ow_s)
    bh_pad = feat_pad[0] + 2
    bw_pad = feat_pad[1] + 2

    x = jnp.atleast_3d(im).astype(dtype)
    nchan = x.shape[2]

    bh = _blocks(h, binsize)
    bw = _blocks(w, binsize)
    vis_h = bh * binsize
    vis_w = bw * binsize
    h_i = jnp.asarray(h, jnp.int32)
    w_i = jnp.asarray(w, jnp.int32)

    # ---- gradients at clamped source coords
    # (reference: src/HOGFeatures.cpp:202-239; the loop runs y,x in
    # [1, visible-1) with source reads clamped to <= size-2).
    # Clamping only changes the last rows/cols, so the clamped reads are
    # static one-pixel shifts where()-patched with a dynamically-sliced
    # boundary row/column — no gathers, and one traced body serves all
    # pyramid levels of a shape bucket (traced h/w).
    yy = jnp.arange(H)
    xx = jnp.arange(W)

    def row_at(img, i):
        """img[i] with traced i, as a (1, W, C) dynamic slice."""
        return jax.lax.dynamic_slice_in_dim(
            img, jnp.clip(jnp.asarray(i, jnp.int32), 0, H - 1), 1, 0)

    def col_at(img, i):
        return jax.lax.dynamic_slice_in_dim(
            img, jnp.clip(jnp.asarray(i, jnp.int32), 0, W - 1), 1, 1)

    h_t = jnp.asarray(h, jnp.int32)
    w_t = jnp.asarray(w, jnp.int32)
    ymask = (yy <= h_t - 3)[:, None, None]
    xmask = (xx <= w_t - 3)[None, :, None]

    # column-clamped image: xc[:, x'] = x[:, min(x', w-2)]
    xc = jnp.where((xx <= w_t - 2)[None, :, None], x, col_at(x, w_t - 2))
    # row-clamped image
    xr = jnp.where((yy <= h_t - 2)[:, None, None], x, row_at(x, h_t - 2))

    # central differences via ONE zero-pad + two slices per direction:
    # slices fuse into the subtraction (a concatenate-based shift
    # materialized two full-image copies per direction — measured in
    # the copy budget of the compiled batch program, PERF.md §copies)
    xc_pad = jnp.pad(xc, ((1, 1), (0, 0), (0, 0)))
    xr_pad = jnp.pad(xr, ((0, 0), (1, 1), (0, 0)))

    # dy = xc[min(y,h-2)+1] - xc[min(y,h-2)-1]
    dy_main = xc_pad[2:] - xc_pad[:-2]
    dy_edge = row_at(xc, h_t - 1) - row_at(xc, h_t - 3)
    dy = jnp.where(ymask, dy_main, dy_edge)
    # dx = xr[:, min(x,w-2)+1] - xr[:, min(x,w-2)-1]
    dx_main = xr_pad[:, 2:] - xr_pad[:, :-2]
    dx_edge = col_at(xr, w_t - 1) - col_at(xr, w_t - 3)
    dx = jnp.where(xmask, dx_main, dx_edge)
    v2 = dx * dx + dy * dy
    if nchan == 3:
        # strongest channel with strict > updates, priority ch0 > ch1 >
        # ch2 on ties (reference: src/HOGFeatures.cpp:217-239 visits
        # BGR order preferring the last channel; our input is RGB so
        # channel 0 has the same role).  Select cascade — no gathers.
        v2b, dxb, dyb = v2[..., 0], dx[..., 0], dy[..., 0]
        for ch in (1, 2):
            upd = v2[..., ch] > v2b
            v2b = jnp.where(upd, v2[..., ch], v2b)
            dxb = jnp.where(upd, dx[..., ch], dxb)
            dyb = jnp.where(upd, dy[..., ch], dyb)
    else:
        v2b, dxb, dyb = v2[..., 0], dx[..., 0], dy[..., 0]

    # ---- orientation snap, tie order d0, -d0, d1, -d1, ... strict >
    # (reference: src/HOGFeatures.cpp:242-249).  The binning only needs
    # the per-orientation magnitude planes, so instead of argmax +
    # one-hot gathers we build a first-wins equality mask.
    uu = jnp.asarray(_UU[:half], dtype)
    vv = jnp.asarray(_VV[:half], dtype)
    dots = dxb[..., None] * uu + dyb[..., None] * vv      # (H, W, half)
    # candidates in the reference's tie order d0, -d0, d1, -d1, ...
    # — binning runs ENTIRELY in this slot order (the per-plane tent
    # products commute with the channel permutation), and the tiny
    # (bh, bw, O) histogram is permuted to orientation channels at the
    # end; permuting the full-resolution mask here cost a materialized
    # (H, W, 2, half) transpose per level (PERF.md §copies)
    cand = jnp.stack([dots, -dots], axis=-1).reshape(
        dots.shape[:2] + (norient,))
    bestv = jnp.max(cand, axis=-1, keepdims=True)
    eq = cand == bestv
    # first-wins slot via the reversed-iota max (same trick as the DT
    # argmax, ops/dt._pass_1d): the smallest slot among the maxima.
    # Replaces the cumsum(eq) scan — a full-resolution 18-channel
    # reduce_window the profiler priced at ~0.3 ms/frame — with one
    # more max reduce over the already-fused eq mask; the boolean
    # result is identical
    iota = jnp.arange(norient, dtype=jnp.int32)
    rev = jnp.where(eq, norient - 1 - iota, jnp.int32(-1))
    winner = (norient - 1) - jnp.max(rev, axis=-1, keepdims=True)
    # zero/negative best -> orientation 0 == slot 0 (+d0)
    winner = jnp.where(bestv > 0, winner, jnp.int32(0))
    first = iota[None, None, :] == winner
    mag = jnp.sqrt(v2b)

    # mask out pixels outside the reference loop range [1, vis-1)
    valid = (((yy >= 1) & (yy <= vis_h - 2))[:, None]
             & ((xx >= 1) & (xx <= vis_w - 2))[None, :])
    mag = jnp.where(valid, mag, 0.0)
    mag_o = mag[..., None] * first.astype(dtype)           # (H, W, O)
    By = _tent_matrix(bh_pad, H, binsize, bh, vis_h, h_i, dtype)
    Bx = _tent_matrix(bw_pad, W, binsize, bw, vis_w, w_i, dtype)
    hist_slots = jnp.einsum("ch,hwo,dw->cdo", By, mag_o, Bx,
                            precision=PRECISION)           # (C, D, O)
    # slots -> orientation channels on the SMALL histogram:
    # orientation o reads slot 2o (o < half) or 2(o-half)+1
    perm = np.concatenate([np.arange(half) * 2,
                           np.arange(half) * 2 + 1])
    hist = hist_slots[:, :, perm]                          # (bh, bw, O)

    # ---- block energy (reference: src/HOGFeatures.cpp:270-283)
    norm = jnp.sum((hist[..., :half] + hist[..., half:norient]) ** 2, -1)

    # ---- normalized features (reference: src/HOGFeatures.cpp:286-339)
    eps = 0.0001
    nsum = (norm[:-1, :-1] + norm[:-1, 1:] + norm[1:, :-1] + norm[1:, 1:])
    ninv = 1.0 / jnp.sqrt(nsum + eps)          # (bh_pad-1, bw_pad-1)
    oh_pad, ow_pad = feat_pad
    n1 = ninv[1:1 + oh_pad, 1:1 + ow_pad]
    n2 = ninv[0:oh_pad, 1:1 + ow_pad]
    n3 = ninv[1:1 + oh_pad, 0:ow_pad]
    n4 = ninv[0:oh_pad, 0:ow_pad]

    hsrc = hist[1:1 + oh_pad, 1:1 + ow_pad, :]
    h1 = jnp.minimum(hsrc * n1[..., None], 0.2)
    h2 = jnp.minimum(hsrc * n2[..., None], 0.2)
    h3 = jnp.minimum(hsrc * n3[..., None], 0.2)
    h4 = jnp.minimum(hsrc * n4[..., None], 0.2)
    sens = 0.5 * (h1 + h2 + h3 + h4)
    t_feats = jnp.stack([h.sum(-1) for h in (h1, h2, h3, h4)],
                        axis=-1) * 0.2357

    ssum = hsrc[..., :half] + hsrc[..., half:norient]
    i1 = jnp.minimum(ssum * n1[..., None], 0.2)
    i2 = jnp.minimum(ssum * n2[..., None], 0.2)
    i3 = jnp.minimum(ssum * n3[..., None], 0.2)
    i4 = jnp.minimum(ssum * n4[..., None], 0.2)
    insens = 0.5 * (i1 + i2 + i3 + i4)

    trunc = jnp.zeros(sens.shape[:2] + (1,), dtype)
    feat = jnp.concatenate([sens, insens, t_feats, trunc], axis=-1)

    # zero outside the true output extent (out = max(blocks-2, 0))
    oy = jnp.arange(oh_pad)
    ox = jnp.arange(ow_pad)
    fvalid = ((oy < bh - 2)[:, None] & (ox < bw - 2)[None, :])
    return feat * fvalid[..., None]
