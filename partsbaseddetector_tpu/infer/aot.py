"""Ahead-of-time executable cache: deterministic serving cold-start.

The reference "compiles" in zero time (it is a C++ binary); the JAX
detector pays an XLA compile per (image shape, model structure, config)
— minutes through a remote-compile tunnel, with the persistent
HLO-level compile cache (.jax_cache) still re-running backend codegen
jitter on load.  This module serializes the COMPILED EXECUTABLE itself
(`jax.experimental.serialize_executable`, the PjRt executable binary +
in/out pytree defs) keyed like the jit cache, so a serving restart is a
deterministic load-from-disk instead of a compile: measured on the
tunnel-attached TPU v5e, person-26 640x480 batch-8 cold compile
50-210 s vs AOT load of a few seconds (PERF.md §AOT).

Weights are TRACED arguments of every program (Detector.update_model
relies on that), so executables are weight-independent: one artifact
serves every same-shaped model.  Keys cover everything else that
changes the program: jax/jaxlib versions, backend + device kind +
device count, the packed model's array shapes/dtypes + static fields,
and the program config.  A load failure of any kind (version skew,
different chip, corrupt file) falls back to the normal compile path —
the cache is an optimization, never a correctness dependency — and the
failure reason is recorded in AotStats.fallback_reason so operational
errors (permissions, disk) surface instead of hiding behind silent
repeated recompiles.

SECURITY: artifacts are raw pickles (the serialized-executable payload
jax hands back).  ``aot_dir`` must be a TRUSTED, PRIVATE directory —
loading an artifact written by an untrusted party is arbitrary code
execution, exactly like .jax_cache or any pickle-based model store.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Any, Optional, Tuple

import jax


_SRC_HASH: Optional[str] = None


def _source_hash() -> str:
    """Hash of the package's .py sources: a code change that alters
    any program must MISS the executable cache (serving a stale
    executable compiled from old code is the one failure mode a silent
    fallback cannot catch — the load would succeed).  Computed once
    per process (~0.5 MB of source)."""
    global _SRC_HASH
    if _SRC_HASH is None:
        import glob

        import partsbaseddetector_tpu as pkg
        root = os.path.dirname(os.path.abspath(pkg.__file__))
        h = hashlib.sha256()
        for p in sorted(glob.glob(os.path.join(root, "**", "*.py"),
                                  recursive=True)):
            h.update(os.path.relpath(p, root).encode())
            with open(p, "rb") as f:
                h.update(f.read())
        _SRC_HASH = h.hexdigest()[:16]
    return _SRC_HASH


def _tree_signature(tree: Any) -> str:
    """Shape/dtype signature of every leaf + the treedef (static fields
    of registered dataclasses land in the treedef repr)."""
    leaves, treedef = jax.tree.flatten(tree)
    sig = [f"{getattr(x, 'shape', ())}:{getattr(x, 'dtype', type(x))}"
           for x in leaves]
    return json.dumps(sig) + str(treedef)


def cache_key(program_config: dict, example_args: Tuple[Any, ...],
              devices=None) -> str:
    """Hex digest identifying one compiled program."""
    devices = devices if devices is not None else jax.devices()
    parts = {
        "jax": jax.__version__,
        "jaxlib": getattr(jax, "jaxlib_version", ""),
        "src": _source_hash(),
        "backend": jax.default_backend(),
        "devices": [f"{d.platform}:{d.device_kind}" for d in devices],
        "config": {k: str(v) for k, v in sorted(
            program_config.items())},
        "args": [_tree_signature(a) for a in example_args],
    }
    return hashlib.sha256(
        json.dumps(parts, sort_keys=True).encode()).hexdigest()[:24]


def _path(aot_dir: str, key: str) -> str:
    return os.path.join(aot_dir, f"aot_{key}.bin")


def load(aot_dir: str, key: str, devices=None,
         stats: Optional["AotStats"] = None):
    """Deserialize a cached executable, or None (missing/unloadable).

    devices: execution devices to load onto; defaults to the first
    device (the single-chip Detector's placement).  Without this,
    deserialization assumes ALL client devices — wrong for a
    single-device program on a multi-device host.

    aot_dir must be TRUSTED (pickle payloads — see module docstring).
    Unloadable artifacts fall back to None with the reason recorded in
    ``stats.fallback_reason``."""
    import pickle

    from jax.experimental import serialize_executable as se
    path = _path(aot_dir, key)
    if not os.path.exists(path):
        return None
    if devices is None:
        devices = [jax.devices()[0]]
    try:
        with open(path, "rb") as f:
            payload, in_tree, out_tree = pickle.load(f)
        return se.deserialize_and_load(payload, in_tree, out_tree,
                                       execution_devices=devices)
    except Exception as e:  # version/device skew, corruption: recompile
        if stats is not None:
            stats.fallback_reason = f"{type(e).__name__}: {e}"
        return None


def save(aot_dir: str, key: str, compiled) -> None:
    """Serialize a compiled executable (best-effort; atomic rename so a
    concurrent reader never sees a partial file)."""
    import pickle

    from jax.experimental import serialize_executable as se
    os.makedirs(aot_dir, exist_ok=True)
    path = _path(aot_dir, key)
    try:
        payload, in_tree, out_tree = se.serialize(compiled)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        os.replace(tmp, path)
    except Exception:
        pass


@dataclasses.dataclass
class AotStats:
    """What happened at last program materialization (observability for
    the serving restart story)."""

    key: str = ""
    hit: bool = False
    compile_s: float = 0.0
    load_s: float = 0.0
    #: why a present artifact could not be loaded ("" = no fallback):
    #: distinguishes operational errors (permissions, disk, corruption)
    #: from a plain cache miss
    fallback_reason: str = ""


def get_or_compile(jitted, example_args: Tuple[Any, ...],
                   program_config: dict,
                   aot_dir: Optional[str],
                   stats: Optional[AotStats] = None,
                   devices=None):
    """Return a callable for ``jitted``: the AOT-cached executable when
    present, else lower+compile (and persist when ``aot_dir`` is set).

    example_args: concrete arrays or ShapeDtypeStructs matching the
    call signature.  The returned callable has Compiled semantics:
    fixed shapes/dtypes/devices (callers normalize input dtype).
    devices: execution devices (default first device); pass the mesh's
    device list for sharded programs — both the cache key and the
    deserialization target follow it.
    """
    import time
    if aot_dir is None:
        return jitted
    key = cache_key(program_config, example_args, devices=devices)
    t0 = time.time()
    cached = load(aot_dir, key, devices=devices, stats=stats)
    if cached is not None:
        if stats is not None:
            stats.key, stats.hit = key, True
            stats.load_s = time.time() - t0
        return cached
    t0 = time.time()
    compiled = jitted.lower(*example_args).compile()
    if stats is not None:
        stats.key, stats.hit = key, False
        stats.compile_s = time.time() - t0
    save(aot_dir, key, compiled)
    return compiled
