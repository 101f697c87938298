"""Shared constants and helpers for the TPU ops."""

from __future__ import annotations

import jax.numpy as jnp

# Large-negative sentinel used instead of -inf so that masked lanes never
# produce NaNs under addition (-inf + -inf is fine but -inf - -inf is not;
# finite sentinels keep XLA max/add fusion simple and safe).
NEG = -1.0e30

DEFAULT_DTYPE = jnp.float32

# Matmul/conv precision for parity-sensitive ops.  On TPU the MXU's default
# f32 path goes through bf16 passes (~1e-3 relative error) — too coarse for
# detection parity, so parity ops request HIGHEST (3-pass f32).  The
# benchmark config can relax this for speed once accuracy is bounded.
PRECISION = "highest"


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def cv_round(x):
    """OpenCV cvRound semantics on device: round half to even."""
    return jnp.rint(x)
