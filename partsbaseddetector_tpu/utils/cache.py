"""Persistent XLA compilation cache.

The flagship 46-scale program costs minutes to compile through the
remote-compile tunnel (BENCH_r01: 196 s); a serving restart must not pay
that again.  JAX's persistent compilation cache keys on (HLO, compile
options, backend version) and is written after every compile above the
time threshold; enabling it is one config call, done here so every CLI
and the bench share the same cache directory.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Route XLA compiles through a persistent on-disk cache.  Safe to
    call multiple times; returns the cache directory in use."""
    import jax

    path = cache_dir or os.environ.get("PBD_JAX_CACHE", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that took meaningful compile time, however small
    # the program (the default 2 s / 0-byte gates are fine, but be
    # explicit so behavior does not drift across jax versions)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
