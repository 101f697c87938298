"""Dataset loading and generation for training/evaluation.

The reference's datasets (PARSE person, annotated faces) load through
getPositiveData/getNegativeData (reference: matlab/learning/
getPositiveData.m) from image dirs + .mat annotation files.  Here:

  * a portable .npz dataset format: images (N, H, W[, 3]) or object
    array, points (N, P, 2), scales (N,);
  * a PARSE-style loader (image directory + keypoint .mat) when such
    data is present;
  * a synthetic articulated-figure generator, used by tests and demos
    since no datasets ship with this image.
"""

from __future__ import annotations

import dataclasses
import glob
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class Sample:
    image: np.ndarray
    points: np.ndarray    # (P, 2) keypoints, or empty for negatives
    scale: float          # GT scale for PCK normalization


def save_dataset(path: str, samples: Sequence[Sample]) -> None:
    def obj_array(items):
        out = np.empty(len(items), dtype=object)
        for i, x in enumerate(items):
            out[i] = np.asarray(x)
        return out

    np.savez(path,
             images=obj_array([s.image for s in samples]),
             points=obj_array([s.points for s in samples]),
             scales=np.asarray([s.scale for s in samples]))


def load_dataset(path: str) -> List[Sample]:
    if os.path.isdir(path):
        return _load_parse_dir(path)
    data = np.load(path, allow_pickle=True)
    return [Sample(image=np.asarray(im, dtype=np.float64),
                   points=np.asarray(pt, dtype=np.float64),
                   scale=float(sc))
            for im, pt, sc in zip(data["images"], data["points"],
                                  data["scales"])]


def _load_parse_dir(path: str) -> List[Sample]:
    """PARSE-style directory: images + a labels.mat with (P, 2, N)
    keypoints (the layout matlab/learning/getPositiveData.m reads)."""
    import scipy.io
    from PIL import Image
    labels = None
    for cand in ("labels.mat", "parse.mat"):
        p = os.path.join(path, cand)
        if os.path.exists(p):
            labels = scipy.io.loadmat(p)
            break
    if labels is None:
        raise FileNotFoundError(f"no labels.mat in {path}")
    key = next(k for k in labels if not k.startswith("__"))
    pts = np.asarray(labels[key], dtype=np.float64)
    images = sorted(glob.glob(os.path.join(path, "*.jpg"))
                    + glob.glob(os.path.join(path, "*.png")))
    out = []
    for i, imgpath in enumerate(images):
        im = np.asarray(Image.open(imgpath).convert("RGB"))
        p = pts[..., i] if pts.ndim == 3 else pts[i]
        span = p.max(0) - p.min(0)
        out.append(Sample(image=im, points=p,
                          scale=float(np.sqrt(span[0] * span[1]))))
    return out


# ------------------------------------------------------------ synthetic

def synthetic_figures(n: int = 20, imsize: Tuple[int, int] = (96, 96),
                      nparts: int = 3, seed: int = 0,
                      noise: float = 40.0,
                      blob: int = 10, spacing: int = 14,
                      jitter: int = 2
                      ) -> Tuple[List[Sample], List[np.ndarray]]:
    """Planted articulated chains in noise: returns (positives,
    negative_images).  Part p sits `spacing` px below part p-1 with
    +-jitter px of x articulation."""
    rng = np.random.default_rng(seed)
    H, W = imsize
    pos: List[Sample] = []
    for _ in range(n):
        im = rng.random((H, W)) * noise
        margin = blob + 2
        cx = int(rng.integers(margin, W - margin))
        cy = int(rng.integers(margin, H - margin
                              - spacing * (nparts - 1)))
        pts = []
        x, y = cx, cy
        for p in range(nparts):
            im[max(y - blob // 2, 0):y + blob // 2,
               max(x - blob // 2, 0):x + blob // 2] += 170
            pts.append([x, y])
            x = int(np.clip(x + rng.integers(-jitter, jitter + 1),
                            margin, W - margin))
            y += spacing
        scale = float(np.sqrt((blob * 1.0) * (blob
                                              + spacing * (nparts - 1))))
        pos.append(Sample(image=np.clip(im, 0, 255),
                          points=np.asarray(pts, np.float64),
                          scale=scale))
    neg = [rng.random((H, W)) * noise for _ in range(max(n // 2, 2))]
    return pos, neg
