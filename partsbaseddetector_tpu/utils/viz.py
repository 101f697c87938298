"""Detection visualization.

Python equivalent of the reference's Visualize component
(reference: src/Visualize.cpp:54-129): an HSV color ramp over parts,
rectangle overlays per part, confidence text for the root.  Renders with
PIL (no OpenCV dependency); returns/writes RGB uint8 arrays.
"""

from __future__ import annotations

import colorsys
from typing import List, Optional, Sequence

import numpy as np


def part_colors(nparts: int) -> List[tuple]:
    """HSV ramp over parts (reference: src/Visualize.cpp:60-72)."""
    out = []
    for p in range(nparts):
        h = p / max(nparts, 1)
        r, g, b = colorsys.hsv_to_rgb(h, 1.0, 1.0)
        out.append((int(r * 255), int(g * 255), int(b * 255)))
    return out


def draw_detections(image: np.ndarray, detections: Sequence,
                    max_candidates: Optional[int] = None,
                    with_score: bool = True) -> np.ndarray:
    """Overlay part boxes for each detection
    (reference: src/Visualize.cpp:74-117).

    image: (H, W[, 3]) uint8/float; detections: list of Detection.
    Returns an RGB uint8 copy."""
    from PIL import Image, ImageDraw

    img = np.asarray(image)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, -1)
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    pil = Image.fromarray(img)
    draw = ImageDraw.Draw(pil)
    H, W = img.shape[:2]

    dets = list(detections)
    if max_candidates is not None:
        dets = dets[:max_candidates]
    for det in dets:
        colors = part_colors(len(det.parts))
        for p, box in enumerate(det.parts):
            x1, y1, x2, y2 = (float(v) for v in box)
            x1, x2 = np.clip([x1, x2], 0, W - 1)
            y1, y2 = np.clip([y1, y2], 0, H - 1)
            if x2 <= x1 or y2 <= y1:
                continue
            draw.rectangle([x1, y1, x2, y2], outline=colors[p], width=1)
        if with_score:
            bx = det.parts[0]
            draw.text((float(np.clip(bx[0], 0, W - 40)),
                       float(np.clip(bx[1] - 12, 0, H - 12))),
                      f"{det.score:.2f}", fill=(255, 255, 255))
    return np.asarray(pil)


def save_image(path: str, image: np.ndarray) -> None:
    from PIL import Image
    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    Image.fromarray(img).save(path)
