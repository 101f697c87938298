"""NumPy oracle: reference-faithful implementation of the detection math.

Every function here reproduces the observable behavior of the corresponding
reference component (cited per function), in float64, with scalar semantics
replicated (rounding modes, tie-breaking, boundary handling).  It is the
golden model for the JAX/Pallas kernels and is deliberately written for
clarity/fidelity, not speed.

This file contains no code copied from the reference; it re-implements the
documented algorithms (Felzenszwalb HOG, Felzenszwalb-Huttenlocher distance
transform, Yang-Ramanan min-sum DP) from their mathematical definitions with
the reference's observable quirks reproduced and cited.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from partsbaseddetector_tpu.models.schema import PartsModel, tree_children


# --------------------------------------------------------------------------
# image resizing (OpenCV semantics, float path)
# --------------------------------------------------------------------------

def cv_round(x):
    """OpenCV cvRound: round half to even (IEEE rint)."""
    return np.rint(x).astype(np.int64)


def resize_linear(im: np.ndarray, dsize: Tuple[int, int]) -> np.ndarray:
    """Bilinear resize with OpenCV INTER_LINEAR float semantics:
    src coordinate of dst x is (x + 0.5) * (sw / dw) - 0.5, edge-clamped.
    Used by the pyramid ladder (reference: src/HOGFeatures.cpp:116).

    im: (h, w) or (h, w, c); dsize: (out_h, out_w)."""
    oh, ow = dsize
    h, w = im.shape[:2]
    if (oh, ow) == (h, w):
        return im.astype(np.float64, copy=True)
    im = im.astype(np.float64)

    def axis_coords(n_out, n_in):
        scale = n_in / n_out
        f = (np.arange(n_out) + 0.5) * scale - 0.5
        i0 = np.floor(f).astype(np.int64)
        frac = f - i0
        # OpenCV clamps the *interpolation*: beyond edges the nearest pixel
        frac = np.where(i0 < 0, 0.0, frac)
        i0 = np.clip(i0, 0, n_in - 1)
        i1 = np.clip(i0 + 1, 0, n_in - 1)
        frac = np.where(i0 == n_in - 1, 0.0, frac)
        return i0, i1, frac

    y0, y1, fy = axis_coords(oh, h)
    x0, x1, fx = axis_coords(ow, w)
    fy = fy[:, None] if im.ndim == 2 else fy[:, None, None]
    fxb = fx[None, :] if im.ndim == 2 else fx[None, :, None]
    top = im[y0][:, x0] * (1 - fxb) + im[y0][:, x1] * fxb
    bot = im[y1][:, x0] * (1 - fxb) + im[y1][:, x1] * fxb
    return top * (1 - fy) + bot * fy


def _reflect101(idx: np.ndarray, n: int) -> np.ndarray:
    """OpenCV BORDER_REFLECT_101 index folding (no edge duplication)."""
    idx = np.asarray(idx)
    if n == 1:
        return np.zeros_like(idx)
    period = 2 * (n - 1)
    idx = np.abs(idx) % period
    return np.where(idx >= n, period - idx, idx)


def pyr_down(im: np.ndarray) -> np.ndarray:
    """OpenCV pyrDown float semantics: 5-tap binomial [1,4,6,4,1]/16 blur
    with BORDER_REFLECT_101, then decimation by 2; output ceil(n/2)
    (reference: src/HOGFeatures.cpp:122)."""
    k = np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
    im = im.astype(np.float64)
    h, w = im.shape[:2]
    oh, ow = (h + 1) // 2, (w + 1) // 2
    ys = 2 * np.arange(oh)
    xs = 2 * np.arange(ow)
    # vertical then horizontal
    acc = np.zeros((oh, w) + im.shape[2:], dtype=np.float64)
    for t in range(5):
        acc += k[t] * im[_reflect101(ys + t - 2, h)]
    out = np.zeros((oh, ow) + im.shape[2:], dtype=np.float64)
    for t in range(5):
        out += k[t] * acc[:, _reflect101(xs + t - 2, w)]
    return out


# --------------------------------------------------------------------------
# scale pyramid
# --------------------------------------------------------------------------

def pyramid_scales(imsize: Tuple[int, int], binsize: int,
                   interval: int) -> Tuple[int, float]:
    """Number of levels and scale factor
    (reference: src/HOGFeatures.cpp:98-99: nscales = 1 + floor(
    log(min(h,w)/(5*binsize)) / log(sfactor)), sfactor = 2^(1/interval))."""
    h, w = imsize
    sfactor = 2.0 ** (1.0 / interval)
    nscales = 1 + int(math.floor(
        math.log(min(float(h), float(w)) / (5.0 * float(binsize)))
        / math.log(sfactor)))
    return nscales, sfactor


def pyramid(im: np.ndarray, binsize: int, interval: int
            ) -> Tuple[List[np.ndarray], List[float]]:
    """Image scale ladder: per sub-octave index i, a bilinear resize by
    1/sfactor^i, then successive pyrDown per octave
    (reference: src/HOGFeatures.cpp:111-127).  Returns (images, scales);
    scales[i] = sfactor^i * binsize, the pixel stride per feature cell
    (reference: src/HOGFeatures.cpp:118,124)."""
    h, w = im.shape[:2]
    nscales, sfactor = pyramid_scales((h, w), binsize, interval)
    if nscales < 1:
        raise ValueError(f"image {h}x{w} too small for binsize {binsize}")
    images: List[Optional[np.ndarray]] = [None] * nscales
    scales = [0.0] * nscales
    for i in range(min(interval, nscales)):
        s = 1.0 / (sfactor ** i)
        # cv::Size_<float> -> Size conversion rounds (saturate_cast)
        dsize = (int(cv_round(np.float32(h) * np.float32(s))),
                 int(cv_round(np.float32(w) * np.float32(s))))
        scaled = resize_linear(im, dsize)
        images[i] = scaled
        scales[i] = (sfactor ** i) * binsize
        j = i + interval
        while j < nscales:
            scaled = pyr_down(scaled)
            images[j] = scaled
            scales[j] = 2.0 * scales[j - interval]
            j += interval
    return images, scales  # type: ignore[return-value]


# --------------------------------------------------------------------------
# HOG features
# --------------------------------------------------------------------------

def hog_features(im: np.ndarray, binsize: int, norient: int = 18,
                 flen: int = 32) -> np.ndarray:
    """Felzenszwalb 31(+1)-channel HOG
    (reference: src/HOGFeatures.cpp:167-341).  Returns (oh, ow, flen).

    Channel layout: [0, norient) contrast-sensitive, [norient,
    3*norient/2) contrast-insensitive, then 4 texture-energy channels and a
    zero truncation channel (reference: src/HOGFeatures.cpp:303-338).
    """
    assert flen == 3 * norient // 2 + 5, (flen, norient)
    im = np.atleast_3d(im).astype(np.float64)
    h, w, nchan = im.shape
    half = norient // 2

    blocks_w = int(math.floor(w / binsize + 0.5))
    blocks_h = int(math.floor(h / binsize + 0.5))
    out_w = max(blocks_w - 2, 0)
    out_h = max(blocks_h - 2, 0)
    vis_w = blocks_w * binsize
    vis_h = blocks_h * binsize

    # unit vectors for orientation snapping
    # (reference: src/HOGFeatures.cpp:192-193)
    uu = np.array([1.000, 0.9397, 0.7660, 0.5000, 0.1736,
                   -0.1736, -0.5000, -0.7660, -0.9397])[:half]
    vv = np.array([0.000, 0.3420, 0.6428, 0.8660, 0.9848,
                   0.9848, 0.8660, 0.6428, 0.3420])[:half]

    ys = np.arange(1, vis_h - 1)
    xs = np.arange(1, vis_w - 1)
    if len(ys) == 0 or len(xs) == 0 or out_w == 0 or out_h == 0:
        return np.zeros((out_h, out_w, flen))
    # clamped source coords (reference: src/HOGFeatures.cpp:208,218)
    sy = np.minimum(ys, h - 2)[:, None]
    sx = np.minimum(xs, w - 2)[None, :]

    dy = im[sy + 1, sx, :] - im[sy - 1, sx, :]
    dx = im[sy, sx + 1, :] - im[sy, sx - 1, :]
    v2 = dx * dx + dy * dy
    if nchan == 3:
        # strongest gradient; ties prefer ch2 then ch1 then ch0
        # (reference: src/HOGFeatures.cpp:217-239, strict > updates)
        order = [2, 1, 0]
        v2o = v2[..., order]
        sel = np.argmax(v2o, axis=-1)
        v2b = np.take_along_axis(v2o, sel[..., None], -1)[..., 0]
        dxb = np.take_along_axis(dx[..., order], sel[..., None], -1)[..., 0]
        dyb = np.take_along_axis(dy[..., order], sel[..., None], -1)[..., 0]
    else:
        v2b, dxb, dyb = v2[..., 0], dx[..., 0], dy[..., 0]

    # orientation snapping with the reference's exact tie order:
    # candidates evaluated as d0, -d0, d1, -d1, ... with strict >
    # (reference: src/HOGFeatures.cpp:242-249)
    dots = uu[None, None, :] * dxb[..., None] + \
        vv[None, None, :] * dyb[..., None]
    cand = np.empty(dots.shape[:-1] + (norient,))
    cand[..., 0::2] = dots
    cand[..., 1::2] = -dots
    kidx = np.argmax(cand, axis=-1)
    best = np.take_along_axis(cand, kidx[..., None], -1)[..., 0]
    orient = np.where(best > 0, kidx // 2 + half * (kidx % 2), 0)
    mag = np.sqrt(v2b)

    # bilinear scatter into cell histograms
    # (reference: src/HOGFeatures.cpp:251-265)
    yp = (ys.astype(np.float64) + 0.5) / binsize - 0.5
    xp = (xs.astype(np.float64) + 0.5) / binsize - 0.5
    iyp = np.floor(yp).astype(np.int64)
    ixp = np.floor(xp).astype(np.int64)
    vy0 = (yp - iyp)[:, None]
    vx0 = (xp - ixp)[None, :]
    vy1, vx1 = 1.0 - vy0, 1.0 - vx0
    iy = iyp[:, None] + np.zeros_like(ixp)[None, :]
    ix = ixp[None, :] + np.zeros_like(iyp)[:, None]

    hist = np.zeros((blocks_h, blocks_w, norient))
    for (oy, ox, wgt) in ((0, 0, vy1 * vx1), (0, 1, vy1 * vx0),
                          (1, 0, vy0 * vx1), (1, 1, vy0 * vx0)):
        yy, xx = iy + oy, ix + ox
        m = (yy >= 0) & (yy < blocks_h) & (xx >= 0) & (xx < blocks_w)
        np.add.at(hist, (yy[m], xx[m], orient[m]),
                  (np.broadcast_to(wgt, mag.shape)[m] * mag[m]))

    # block energy (reference: src/HOGFeatures.cpp:270-283)
    norm = np.sum((hist[..., :half] + hist[..., half:norient]) ** 2, axis=-1)

    # normalized features (reference: src/HOGFeatures.cpp:286-339)
    eps = 0.0001
    nsum = (norm[:-1, :-1] + norm[:-1, 1:] + norm[1:, :-1] + norm[1:, 1:])
    ninv = 1.0 / np.sqrt(nsum + eps)      # (blocks_h-1, blocks_w-1)
    # n1 window starts at (y+1, x+1); n2 at (y, x+1); n3 at (y+1, x);
    # n4 at (y, x) -- for output pixel (y, x)
    n1 = ninv[1:1 + out_h, 1:1 + out_w]
    n2 = ninv[0:out_h, 1:1 + out_w]
    n3 = ninv[1:1 + out_h, 0:out_w]
    n4 = ninv[0:out_h, 0:out_w]

    hsrc = hist[1:1 + out_h, 1:1 + out_w, :]          # (oh, ow, norient)
    feat = np.zeros((out_h, out_w, flen))
    h1 = np.minimum(hsrc * n1[..., None], 0.2)
    h2 = np.minimum(hsrc * n2[..., None], 0.2)
    h3 = np.minimum(hsrc * n3[..., None], 0.2)
    h4 = np.minimum(hsrc * n4[..., None], 0.2)
    feat[..., :norient] = 0.5 * (h1 + h2 + h3 + h4)
    t1, t2, t3, t4 = (h.sum(-1) for h in (h1, h2, h3, h4))

    ssum = hsrc[..., :half] + hsrc[..., half:norient]
    i1 = np.minimum(ssum * n1[..., None], 0.2)
    i2 = np.minimum(ssum * n2[..., None], 0.2)
    i3 = np.minimum(ssum * n3[..., None], 0.2)
    i4 = np.minimum(ssum * n4[..., None], 0.2)
    feat[..., norient:norient + half] = 0.5 * (i1 + i2 + i3 + i4)

    feat[..., norient + half + 0] = 0.2357 * t1
    feat[..., norient + half + 1] = 0.2357 * t2
    feat[..., norient + half + 2] = 0.2357 * t3
    feat[..., norient + half + 3] = 0.2357 * t4
    # truncation channel stays zero (reference: src/HOGFeatures.cpp:338)
    return feat


# --------------------------------------------------------------------------
# filter-bank correlation
# --------------------------------------------------------------------------

def conv_bank(feature: np.ndarray, filters: Sequence[np.ndarray]
              ) -> List[np.ndarray]:
    """Same-size multi-channel correlation of one feature map with a bank of
    part filters, centered anchor, with the reference's border semantics:
    channels 0..C-2 zero-padded, last channel one-padded — the boundary
    occlusion feature (reference: src/SpatialConvolutionEngine.cpp:70-93,
    146-157).  feature: (H, W, C); each filter (kh, kw, C).
    Returns list of (H, W) responses."""
    H, W, C = feature.shape
    out = []
    for K in filters:
        kh, kw, kc = K.shape
        assert kc == C
        ay, ax = kh // 2, kw // 2
        pt, pb = ay, kh - 1 - ay
        pl, pr = ax, kw - 1 - ax
        padded = np.zeros((H + kh - 1, W + kw - 1, C))
        padded[..., C - 1] = 1.0
        padded[pt:pt + H, pl:pl + W, :] = feature
        r = np.zeros((H, W))
        for i in range(kh):
            for j in range(kw):
                r += np.einsum("yxc,c->yx",
                               padded[i:i + H, j:j + W, :], K[i, j, :])
        out.append(r)
    return out


# --------------------------------------------------------------------------
# generalized distance transform
# --------------------------------------------------------------------------

def _dt_row(src: np.ndarray, a: float, b: float, os: int
            ) -> Tuple[np.ndarray, np.ndarray]:
    """1-D generalized DT of a sampled function under f(x, y) = a x^2 + b x
    + y with anchor offset applied at read-out — the lower-envelope algorithm
    of Felzenszwalb & Huttenlocher with the reference's exact control flow
    (reference: include/DistanceTransform.hpp:152-182).  Since the DP passes
    a < 0 (negated penalty), this computes the max-transform."""
    N = src.shape[0]
    v = np.zeros(N, dtype=np.int64)
    z = np.zeros(N + 1)
    dst = np.zeros(N)
    ptr = np.zeros(N, dtype=np.int64)

    def intersect(x0, x1, y0, y1):
        return ((y1 - y0) - b * (x1 - x0) + a * (x1 * x1 - x0 * x0)) \
            / (2.0 * a * (x1 - x0))

    k = 0
    v[0] = 0
    z[0] = -np.inf
    z[1] = np.inf
    for q in range(1, N):
        s = intersect(v[k], q, src[v[k]], src[q])
        while s <= z[k] and k > 0:
            k -= 1
            s = intersect(v[k], q, src[v[k]], src[q])
        k += 1
        v[k] = q
        z[k] = s
        z[k + 1] = np.inf

    k = 0
    for q in range(N):
        while z[k + 1] < os:
            k += 1
        d = os - v[k]
        dst[q] = a * d * d + b * d + src[v[k]]
        ptr[q] = v[k]
        os += 1
    return dst, ptr


def distance_transform(score: np.ndarray, w: Sequence[float],
                       anchor: Sequence[int],
                       compose: str = "reference"
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """2-D separable generalized distance transform with deformation
    weights w = (w0, w1, w2, w3) and anchor (ax, ay), matching
    ``DynamicProgram::min``'s invocation ``fx = Quadratic(-w0, -w1),
    fy = Quadratic(-w2, -w3)`` (reference: src/DynamicProgram.cpp:125-128)
    and ``DistanceTransform::compute``
    (reference: include/DistanceTransform.hpp:203-245).

    Returns (score_out, Ix, Iy), each (M, N) indexed [parent_y, parent_x].

    compose="reference" reproduces the reference's argmin table composition
    exactly: the row-pass table Ix is *not* re-indexed through the column
    pass (its rows remain child-y), and Iy is composed as
    Iy[m][n] = IyCol[m][Ix[m][n]] (include/DistanceTransform.hpp:233-244).
    compose="correct" yields the textbook composition
    (Iy = IyCol; Ix[py][px] = IxRow[IyCol[py][px]][px]).
    """
    M, N = score.shape
    ax, ay = int(anchor[0]), int(anchor[1])
    w0, w1, w2, w3 = (float(x) for x in w)

    tmp = np.zeros_like(score)
    IxRow = np.zeros((M, N), dtype=np.int64)
    for m in range(M):
        tmp[m], IxRow[m] = _dt_row(score[m], -w0, -w1, ax)

    out_t = np.zeros((N, M))
    IyCol_t = np.zeros((N, M), dtype=np.int64)
    tmp_t = tmp.T.copy()
    for n in range(N):
        out_t[n], IyCol_t[n] = _dt_row(tmp_t[n], -w2, -w3, ay)
    out = out_t.T.copy()
    IyCol = IyCol_t.T.copy()   # [parent_y, parent_x] -> best child y

    if compose == "reference":
        Ix = IxRow.copy()      # rows are child-y, read later as parent-y
        Iy = np.take_along_axis(IyCol, np.clip(IxRow, 0, N - 1), axis=1)
    elif compose == "correct":
        Iy = IyCol
        Ix = np.take_along_axis(IxRow, IyCol, axis=0)
    else:
        raise ValueError(compose)
    return out, Ix, Iy


def _dt_row_shift(src: np.ndarray, a: float, b: float, off: float,
                  dlen: int, dstep: float
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """1-D envelope DT read out on a shifted, strided output grid
    q_i = off + i*dstep — the Matlab mex kernel's dt1d
    (reference: matlab/oct/shiftdt.cc:17-52).  a < 0 computes the
    max-transform (the mex negates the model penalty on entry,
    shiftdt.cc:72-75)."""
    N = src.shape[0]
    v = np.zeros(N, dtype=np.int64)
    z = np.zeros(N + 1)
    dst = np.zeros(dlen)
    ptr = np.zeros(dlen, dtype=np.int64)

    def intersect(x0, x1, y0, y1):
        return ((y1 - y0) - b * (x1 - x0) + a * (x1 * x1 - x0 * x0)) \
            / (2.0 * a * (x1 - x0))

    k = 0
    v[0] = 0
    z[0] = -np.inf
    z[1] = np.inf
    for q in range(1, N):
        s = intersect(v[k], q, src[v[k]], src[q])
        while s <= z[k] and k > 0:
            k -= 1
            s = intersect(v[k], q, src[v[k]], src[q])
        k += 1
        v[k] = q
        z[k] = s
        z[k + 1] = np.inf

    k = 0
    q = float(off)
    for i in range(dlen):
        while z[k + 1] < q:
            k += 1
        d = q - v[k]
        dst[i] = a * d * d + b * d + src[v[k]]
        ptr[i] = v[k]
        q += dstep
    return dst, ptr


def shiftdt(score: np.ndarray, w: Sequence[float], startx: float,
            starty: float, lenx: int, leny: int, step: float = 1.0
            ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Strided/shifted 2-D generalized DT, the Matlab multi-resolution
    message-passing kernel (reference: matlab/oct/shiftdt.cc:56-122):
    y pass over columns first, then x over rows, output grid
    (starty + i*step, startx + j*step), argmin composition
    Iy[i, j] = tmpIy[i, Ix[i, j]] (shiftdt.cc:105-111, 0-based here).

    w = (w0, w1, w2, w3) >= 0 deformation penalty.  Returns (out, Ix, Iy)
    each (leny, lenx) with child-grid coordinates."""
    H, W = score.shape
    w0, w1, w2, w3 = (float(x) for x in w)

    tmp = np.zeros((leny, W))
    iy_col = np.zeros((leny, W), dtype=np.int64)
    for x in range(W):
        tmp[:, x], iy_col[:, x] = _dt_row_shift(
            score[:, x], -w2, -w3, starty, leny, step)

    out = np.zeros((leny, lenx))
    ix = np.zeros((leny, lenx), dtype=np.int64)
    for y in range(leny):
        out[y], ix[y] = _dt_row_shift(
            tmp[y], -w0, -w1, startx, lenx, step)

    iy = np.take_along_axis(iy_col, ix, axis=1)
    return out, ix, iy


def distance_transform_bruteforce(score: np.ndarray, w: Sequence[float],
                                  anchor: Sequence[int]
                                  ) -> Tuple[np.ndarray, np.ndarray,
                                             np.ndarray]:
    """O(N^2) direct evaluation of the same max-transform (separable),
    used to cross-check the envelope kernel.  Matches compose='reference'."""
    M, N = score.shape
    ax, ay = int(anchor[0]), int(anchor[1])
    w0, w1, w2, w3 = (float(x) for x in w)

    px = np.arange(N)
    dxm = (px[:, None] + ax) - px[None, :]          # [parent_x, child_x]
    penx = -w0 * dxm * dxm - w1 * dxm
    cand = score[:, None, :] + penx[None, :, :]     # [cy, px, cx]
    tmp = cand.max(-1)
    IxRow = cand.argmax(-1)

    py = np.arange(M)
    dym = (py[:, None] + ay) - py[None, :]
    peny = -w2 * dym * dym - w3 * dym
    cand2 = tmp.T[:, None, :] + peny[None, :, :]    # [px, py, cy]
    out = cand2.max(-1).T
    IyCol = cand2.argmax(-1).T
    Ix = IxRow
    Iy = np.take_along_axis(IyCol, np.clip(IxRow, 0, N - 1), axis=1)
    return out, Ix, Iy


# --------------------------------------------------------------------------
# dynamic program
# --------------------------------------------------------------------------

def _bias_entry(model: PartsModel, c: int, p: int, m_child: int,
                m_parent: int) -> float:
    """biasw[biasid[p][m_child] + m_parent]
    (reference: include/Parts.hpp:172-175 via src/DynamicProgram.cpp:139)."""
    off = model.components[c].parts[p].biasid[m_child]
    return float(model.biasw[off + m_parent])


def dp_min(model: PartsModel, c: int, pdfs: List[np.ndarray],
           compose: str = "reference"):
    """Min-sum (max-sum after negation) message passing, leaf-to-root, for
    one component at one scale (reference: src/DynamicProgram.cpp:66-173).

    pdfs: per-FILTER response maps (list indexed by global filter id, same
    ordering as model.filters — reference: include/Parts.hpp:165-168).

    Returns (rootv, rooti, Ix, Iy, Ik) where Ix/Iy/Ik are dicts
    [part][parent_mixture] -> (M, N) int arrays."""
    comp = model.components[c]
    nparts = comp.nparts
    ncs: Dict[int, np.ndarray] = {}    # accumulated scores by filter id
    Ix: Dict[int, List[np.ndarray]] = {}
    Iy: Dict[int, List[np.ndarray]] = {}
    Ik: Dict[int, List[np.ndarray]] = {}

    for p in range(nparts - 1, 0, -1):
        part = comp.parts[p]
        nmix = part.nmixtures
        pnmix = comp.parts[part.parentid].nmixtures
        scoresp, Ixp, Iyp = [], [], []
        for m in range(nmix):
            fid = part.filterid[m]
            score_in = ncs.get(fid, pdfs[fid])
            w = model.defw[part.defid[m]]
            anchor = model.anchors[part.defid[m]]
            sdt, ix, iy = distance_transform(score_in, w, anchor, compose)
            scoresp.append(sdt)
            Ixp.append(ix)
            Iyp.append(iy)

        Ix[p], Iy[p], Ik[p] = [], [], []
        for mp in range(pnmix):
            weighted = np.stack([scoresp[mm] + _bias_entry(model, c, p,
                                                           mm, mp)
                                 for mm in range(nmix)])
            # reduceMax: strict >, first index wins ties
            # (reference: include/Math.hpp:177-183)
            maxi = np.argmax(weighted, axis=0)
            maxv = np.take_along_axis(weighted, maxi[None], 0)[0]
            Ixm = np.take_along_axis(np.stack(Ixp), maxi[None], 0)[0]
            Iym = np.take_along_axis(np.stack(Iyp), maxi[None], 0)[0]
            Ix[p].append(Ixm)
            Iy[p].append(Iym)
            Ik[p].append(maxi)

            pfid = comp.parts[part.parentid].filterid[mp]
            if pfid not in ncs:
                ncs[pfid] = pdfs[pfid].copy()
            ncs[pfid] = ncs[pfid] + maxv

    root = comp.parts[0]
    bias = float(model.biasw[root.biasid[0]])
    weighted = []
    for m in range(root.nmixtures):
        fid = root.filterid[m]
        s = ncs.get(fid, pdfs[fid])
        weighted.append(s + bias)
    weighted = np.stack(weighted)
    rooti = np.argmax(weighted, axis=0)
    rootv = np.take_along_axis(weighted, rooti[None], 0)[0]
    return rootv, rooti, Ix, Iy, Ik


@dataclasses.dataclass
class OracleCandidate:
    component: int
    score: float
    scale_index: int
    parts: np.ndarray       # (P, 4) int boxes: x1, y1, x2, y2
    locations: np.ndarray   # (P, 3) int: x, y, mixture (feature grid coords)


def dp_argmin(model: PartsModel, c: int, rootv, rooti, scale: float,
              scale_index: int, Ix, Iy, Ik) -> List[OracleCandidate]:
    """Backtracking: threshold root score, then walk root->leaf reading the
    argmax tables at the parent's location
    (reference: src/DynamicProgram.cpp:189-255)."""
    comp = model.components[c]
    nparts = comp.nparts
    ys, xs = np.nonzero(rootv > model.thresh)   # row-major like Math::find
    out: List[OracleCandidate] = []
    for y0, x0 in zip(ys, xs):
        xv = np.zeros(nparts, dtype=np.int64)
        yv = np.zeros(nparts, dtype=np.int64)
        mv = np.zeros(nparts, dtype=np.int64)
        boxes = np.zeros((nparts, 4), dtype=np.int64)
        for p in range(nparts):
            part = comp.parts[p]
            if p == 0:
                x, y, m = int(x0), int(y0), int(rooti[y0, x0])
            else:
                idx = part.parentid
                px_, py_, pm_ = xv[idx], yv[idx], mv[idx]
                x = int(Ix[p][pm_][py_, px_])
                y = int(Iy[p][pm_][py_, px_])
                m = int(Ik[p][pm_][py_, px_])
            xv[p], yv[p], mv[p] = x, y, m
            # box: xy1 = (pt - 1) * scale, xy2 = xy1 + size*scale - 1,
            # cv::Point*double rounds (reference: src/DynamicProgram.cpp:
            # 238-240; xsize==ysize==filter rows per the reference's
            # ysize quirk, include/Parts.hpp:185-187)
            fs = model.filters[part.filterid[m]].shape
            xsize = ysize = fs[0]
            x1 = int(cv_round((x - 1) * scale))
            y1 = int(cv_round((y - 1) * scale))
            x2 = x1 + int(cv_round(xsize * scale)) - 1
            y2 = y1 + int(cv_round(ysize * scale)) - 1
            boxes[p] = (x1, y1, x2, y2)
        out.append(OracleCandidate(
            component=c, score=float(rootv[y0, x0]),
            scale_index=scale_index, parts=boxes,
            locations=np.stack([xv, yv, mv], axis=1)))
    return out


# --------------------------------------------------------------------------
# end-to-end detection
# --------------------------------------------------------------------------

def detect(im: np.ndarray, model: PartsModel,
           compose: str = "reference") -> List[OracleCandidate]:
    """Full pipeline: pyramid -> HOG -> filter bank -> DP -> backtracking
    (reference: src/PartsBasedDetector.cpp:69-95)."""
    images, scales = pyramid(im, model.binsize, model.interval)
    feats = [hog_features(x, model.binsize, model.norient, model.flen)
             for x in images]
    candidates: List[OracleCandidate] = []
    for n, feat in enumerate(feats):
        pdfs = conv_bank(feat, model.filters)
        for c in range(model.ncomponents):
            rootv, rooti, Ix, Iy, Ik = dp_min(model, c, pdfs, compose)
            candidates.extend(dp_argmin(model, c, rootv, rooti,
                                        scales[n], n, Ix, Iy, Ik))
    return candidates


def sort_candidates(cands: List[OracleCandidate]) -> List[OracleCandidate]:
    """Descending by root score (reference: include/Candidate.hpp:97-99)."""
    return sorted(cands, key=lambda c: -c.score)
