"""Multi-host initialization and metric aggregation.

The reference is single-process shared-memory only (SURVEY.md §2a); the
TPU-native scaling story is `jax.distributed` across hosts with XLA
collectives over ICI/DCN.  Problems are independent, so the only cross-host
traffic is metric reduction (cost traces / solve stats) — host 0 aggregates.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed when running multi-host (no-op for a
    single process).  Arguments fall back to the standard env vars."""
    if num_processes is None:
        num_processes = int(os.environ.get("ILQG_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator
        or os.environ.get("ILQG_COORDINATOR", "127.0.0.1:12345"),
        num_processes=num_processes,
        process_id=process_id
        if process_id is not None
        else int(os.environ.get("ILQG_PROCESS_ID", "0")))


def global_mean(x: jnp.ndarray, mesh, axis: str = "data") -> jnp.ndarray:
    """Scalar mean of a per-instance metric across the whole mesh (one psum
    over ICI — the only collective this workload needs).  Assumes the batch
    divides evenly over the mesh (per-shard mean of per-shard means)."""
    from jax.sharding import PartitionSpec as P

    def _mean(v):
        return jax.lax.pmean(jnp.mean(v), axis)

    f = jax.jit(
        jax.shard_map(_mean, mesh=mesh, in_specs=P(axis), out_specs=P()))
    return f(x)
