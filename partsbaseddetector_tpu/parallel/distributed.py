"""Multi-host initialization.

The reference is strictly single-process (SURVEY.md §2.4); multi-host
execution here rides jax.distributed over DCN with ICI collectives
inside the jitted programs.  This module is the one place that touches
process-level runtime state."""

from __future__ import annotations

import os
from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed.  With no arguments, reads the standard
    environment (JAX_COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID or
    the cloud-TPU metadata auto-detection)."""
    import jax

    kwargs = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = (
            coordinator_address
            or os.environ["JAX_COORDINATOR_ADDRESS"])
    if num_processes or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(
            num_processes or os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(
            process_id if process_id is not None
            else os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)


def global_mesh_shape(filter_axis: int = 1):
    """Default (data, filter) mesh over all global devices."""
    import jax
    n = len(jax.devices())
    assert n % filter_axis == 0
    return (n // filter_axis, filter_axis)
