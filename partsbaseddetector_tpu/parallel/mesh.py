"""Mesh construction helpers.

Axes:
  data    — image/batch parallelism (the analog of running the reference
            detector on many frames, ros/Node.cpp:144);
  filter  — mixture-filter-bank model parallelism (the analog of the
            reference's OpenMP loop over filters,
            src/SpatialConvolutionEngine.cpp:114-117).

Scale parallelism rides the data axis in practice (levels are batched
per octave bucket and the bucket tensors are sharded on their leading
axis when beneficial).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              devices: Optional[Sequence] = None,
              axis_names: Tuple[str, str] = ("data", "filter")) -> Mesh:
    """Create a (data, filter) mesh over the given devices.

    shape defaults to (ndevices, 1) — pure data parallelism."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    assert shape[0] * shape[1] == n, (shape, n)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)
