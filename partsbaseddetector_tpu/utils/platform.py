"""Platform selection helper.

The deployment image's sitecustomize force-registers the TPU PJRT plugin
and programmatically sets jax_platforms, overriding the JAX_PLATFORMS
environment variable.  ``ensure_platform`` re-applies the user's choice
(PBD_PLATFORM env var or explicit argument) after jax import, before any
computation."""

from __future__ import annotations

import os


def ensure_platform(platform: str | None = None) -> None:
    """platform: "cpu", "tpu"/"axon", or None to honor $PBD_PLATFORM
    (no-op if neither is set)."""
    plat = platform or os.environ.get("PBD_PLATFORM")
    if not plat:
        return
    import jax
    jax.config.update("jax_platforms",
                      {"tpu": "axon,cpu"}.get(plat, plat))
