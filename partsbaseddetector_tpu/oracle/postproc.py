"""NumPy oracle for the post-processing stages: the reference's three NMS
variants, replicated algorithm-for-algorithm for cross-checking the
device ops."""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def grid_nms_blockwise(src: np.ndarray, sz: int,
                       mask: Optional[np.ndarray] = None) -> np.ndarray:
    """Neubeck & Van Gool block NMS, faithful to the reference scan
    (reference: src/nms.cpp:84-129): per (sz+1)-strided block, find the
    block max, verify it against its (2sz+1) neighborhood with the block
    itself masked out; mark if strictly greater.  Returns bool mask."""
    M, N = src.shape
    out = np.zeros((M, N), bool)
    neg = -np.inf
    eff = src.copy()
    if mask is not None:
        eff[~mask] = neg
    for m in range(0, M, sz + 1):
        for n in range(0, N, sz + 1):
            ic = slice(m, min(m + sz + 1, M))
            jc = slice(n, min(n + sz + 1, N))
            blk = eff[ic, jc]
            if not np.isfinite(blk).any():
                continue
            k = np.unravel_index(np.argmax(blk), blk.shape)
            cy, cx = m + k[0], n + k[1]
            vc = eff[cy, cx]
            inn = slice(max(cy - sz, 0), min(cy + sz + 1, M))
            jnn = slice(max(cx - sz, 0), min(cx + sz + 1, N))
            nb = eff[inn, jnn].copy()
            # mask out the block whose max we already know
            bi0 = ic.start - inn.start
            bj0 = jc.start - jnn.start
            nb[max(bi0, 0):bi0 + sz + 1, max(bj0, 0):bj0 + sz + 1] = neg
            vn = nb.max() if nb.size else neg
            if vc > vn:
                out[cy, cx] = True
    return out


def paint_nms(boxes: np.ndarray, scores: np.ndarray,
              imsize: Tuple[int, int],
              overlap: float = 0.0) -> np.ndarray:
    """Greedy paint NMS (reference: include/Candidate.hpp:277-304).

    boxes: (K, 4) covering boxes x1, y1, x2, y2 with x2/y2 EXCLUSIVE
    (cv::Rect two-point construction); scores only define the input
    order contract (must be sorted descending).  Returns keep mask."""
    H, W = imsize
    scratch = np.zeros((H, W), np.uint8)
    keep = np.zeros(len(boxes), bool)
    for i in range(len(boxes)):
        x1 = int(np.clip(boxes[i, 0], 0, W))
        y1 = int(np.clip(boxes[i, 1], 0, H))
        x2 = int(np.clip(boxes[i, 2], 0, W))
        y2 = int(np.clip(boxes[i, 3], 0, H))
        area = max((x2 - x1) * (y2 - y1), 1)
        if scratch[y1:y2, x1:x2].sum() / area > overlap:
            continue
        scratch[y1:y2, x1:x2] = 1
        keep[i] = True
    return keep


def part_nms(part_boxes: np.ndarray, scores: np.ndarray,
             overlap: float = 0.5) -> np.ndarray:
    """Matlab per-part greedy NMS (reference: matlab/detection/nms.m:
    24-68).  part_boxes: (K, P, 4) inclusive coords; boxes must be
    sorted by descending score.  Returns keep mask."""
    K, P, _ = part_boxes.shape
    cov = np.stack([part_boxes[:, :, 0].min(1), part_boxes[:, :, 1].min(1),
                    part_boxes[:, :, 2].max(1), part_boxes[:, :, 3].max(1)],
                   axis=1)
    b = np.concatenate([part_boxes, cov[:, None, :]], axis=1)  # (K, P+1, 4)
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    keep = np.ones(K, bool)
    for i in range(K):
        if not keep[i]:
            continue
        for j in range(i + 1, K):
            if not keep[j]:
                continue
            xx1 = np.maximum(x1[i], x1[j])
            yy1 = np.maximum(y1[i], y1[j])
            xx2 = np.minimum(x2[i], x2[j])
            yy2 = np.minimum(y2[i], y2[j])
            w = np.maximum(xx2 - xx1 + 1, 0)
            h = np.maximum(yy2 - yy1 + 1, 0)
            o = ((w * h) / area[i]).max()
            if o > overlap:
                keep[j] = False
    return keep
