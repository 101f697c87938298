"""Mixture filter-bank scoring as one MXU convolution.

The reference's triple loop — scales x filters x channels, each a 2-D
cv::FilterEngine correlation (reference: src/SpatialConvolutionEngine.cpp:
85-123, src/filter.cpp:360-458) — collapses into a single
``lax.conv_general_dilated`` per shape bucket: feature channels are the
conv input channels, and all F mixture filters are output channels.

Border semantics replicated: the response is "same"-size with the kernel
anchored at its center (kh//2, kw//2), features beyond the image border
read as zero in channels 0..C-2 and one in the truncation channel C-1 —
the boundary-occlusion feature (reference: src/SpatialConvolutionEngine.
cpp:146-157).  We realize this by padding the feature map with the
occlusion pattern and running a VALID conv.

Filters of different spatial sizes are packed into one (FH, FW) bank with
a per-filter top-left shift chosen so each filter's center anchor stays
fixed; the zero padding contributes nothing, so responses are exact.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from partsbaseddetector_tpu.ops.common import DEFAULT_DTYPE, PRECISION


def pack_filter_bank(filters: Sequence[np.ndarray],
                     dtype=np.float32) -> Tuple[np.ndarray, np.ndarray]:
    """Pack variably-sized (kh, kw, C) filters into one (FH, FW, C, F)
    bank (HWIO layout).  Each filter is placed so that its OpenCV center
    anchor (kh//2, kw//2) lands on the bank's anchor (FH//2, FW//2).

    Returns (bank, sizes) with sizes (F, 2) = per-filter (kh, kw)."""
    FH = max(f.shape[0] for f in filters)
    FW = max(f.shape[1] for f in filters)
    C = filters[0].shape[2]
    F = len(filters)
    bank = np.zeros((FH, FW, C, F), dtype=dtype)
    sizes = np.zeros((F, 2), dtype=np.int32)
    for n, f in enumerate(filters):
        kh, kw, c = f.shape
        assert c == C, "all filters must share the feature length"
        oy = FH // 2 - kh // 2
        ox = FW // 2 - kw // 2
        assert 0 <= oy and oy + kh <= FH and 0 <= ox and ox + kw <= FW
        bank[oy:oy + kh, ox:ox + kw, :, n] = f
        sizes[n] = (kh, kw)
    return bank, sizes


def occlusion_pad(features: jnp.ndarray, pads: Tuple[int, int, int, int],
                  true_size=None) -> jnp.ndarray:
    """Pad (.., H, W, C) features with the occlusion border pattern:
    zeros in channels 0..C-2, ones in channel C-1.  pads = (top, bottom,
    left, right).  If true_size=(h, w) is given (traced ok), the pattern
    is also written inside the buffer beyond the true extent, so every
    pyramid level in a padded bucket sees its own occlusion border."""
    t, b, l, r = pads
    C = features.shape[-1]
    if true_size is not None:
        h, w = true_size
        yy = jnp.arange(features.shape[-3])
        xx = jnp.arange(features.shape[-2])
        inside = ((yy < h)[:, None] & (xx < w)[None, :])[..., None]
        occl = jnp.zeros((C,), features.dtype).at[C - 1].set(1.0)
        features = jnp.where(inside, features, occl)
    batch_pads = [(0, 0)] * (features.ndim - 3)
    padded = jnp.pad(features, batch_pads + [(t, b), (l, r), (0, 0)])
    if t or b or l or r:
        # set the truncation channel to 1 in the halo
        H = features.shape[-3]
        W = features.shape[-2]
        yy = jnp.arange(H + t + b)
        xx = jnp.arange(W + l + r)
        halo = ~(((yy >= t) & (yy < t + H))[:, None]
                 & ((xx >= l) & (xx < l + W))[None, :])
        ch = jnp.arange(C) == (C - 1)
        padded = padded + (halo[..., None] & ch).astype(padded.dtype)
    return padded


def conv_bank(features: jnp.ndarray, bank: jnp.ndarray,
              true_size=None, dtype=DEFAULT_DTYPE) -> jnp.ndarray:
    """Correlate features with the packed filter bank.

    features: (L, H, W, C) (or (H, W, C)); bank: (FH, FW, C, F).
    true_size: per-level true feature sizes (L, 2) or (2,), traced ok.
    Returns (L, H, W, F) same-size responses (garbage beyond true size —
    mask downstream)."""
    squeeze = features.ndim == 3
    if squeeze:
        features = features[None]
    FH, FW = bank.shape[:2]
    ay, ax = FH // 2, FW // 2
    pads = (ay, FH - 1 - ay, ax, FW - 1 - ax)
    if true_size is not None and jnp.asarray(true_size).ndim == 1:
        true_size = jnp.asarray(true_size)[None]
    if true_size is None:
        padded = occlusion_pad(features, pads)
    else:
        padded = jax.vmap(
            lambda f, ts: occlusion_pad(f, pads, ts))(
                features, jnp.asarray(true_size))
    out = jax.lax.conv_general_dilated(
        padded.astype(dtype), jnp.asarray(bank, dtype),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=PRECISION,
        preferred_element_type=dtype)
    return out[0] if squeeze else out


def conv_bank_fft(features: jnp.ndarray, bank: jnp.ndarray,
                  true_size=None, dtype=DEFAULT_DTYPE) -> jnp.ndarray:
    """Frequency-domain variant of conv_bank: rfft2 of features and the
    (flipped) filter bank, per-channel spectral multiply-accumulate,
    inverse transform, crop.

    This realizes the INTENT of the reference's FourierConvolutionEngine
    (frequency-domain scoring for large filter banks) whose setFilters
    never stored its precomputed spectra — the engine was dead code
    (reference: src/FourierConvolutionEngine.cpp:118-138, noted in
    SURVEY.md §2.1).  Results match conv_bank to float tolerance;
    asymptotically cheaper when kh*kw greatly exceeds log(HW).

    Same signature/semantics as conv_bank."""
    squeeze = features.ndim == 3
    if squeeze:
        features = features[None]
    FH, FW = bank.shape[:2]
    ay, ax = FH // 2, FW // 2
    pads = (ay, FH - 1 - ay, ax, FW - 1 - ax)
    if true_size is not None and jnp.asarray(true_size).ndim == 1:
        true_size = jnp.asarray(true_size)[None]
    if true_size is None:
        padded = occlusion_pad(features, pads)
    else:
        padded = jax.vmap(
            lambda f, ts: occlusion_pad(f, pads, ts))(
                features, jnp.asarray(true_size))
    L, Hp, Wp, C = padded.shape
    F = bank.shape[3]
    # correlation via FFT: conj of the kernel spectrum
    fft_h, fft_w = Hp, Wp
    feat_f = jnp.fft.rfft2(
        jnp.moveaxis(padded.astype(jnp.float32), -1, 1),
        s=(fft_h, fft_w))                       # (L, C, Hp, Wf)
    bank_f = jnp.fft.rfft2(
        jnp.transpose(jnp.asarray(bank, jnp.float32), (3, 2, 0, 1)),
        s=(fft_h, fft_w))                       # (F, C, Hp, Wf)
    resp_f = jnp.einsum("lchw,fchw->lfhw", feat_f, jnp.conj(bank_f))
    resp = jnp.fft.irfft2(resp_f, s=(fft_h, fft_w))   # (L, F, Hp, Wp)
    # correlation alignment: output (y, x) corresponds to kernel top-left
    # at padded (y, x); the centered-anchor response starts at 0 after
    # the VALID-style crop below
    H = Hp - (FH - 1)
    W = Wp - (FW - 1)
    out = jnp.moveaxis(resp[:, :, :H, :W], 1, -1).astype(dtype)
    return out[0] if squeeze else out
