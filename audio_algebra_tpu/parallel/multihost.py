"""Multi-host (multi-process) scaffolding.

The reference trained multi-node via Lightning's `num_nodes` + NCCL
(reference train_aa_mixer.py:147-159). The jax equivalent: one process per
host, `jax.distributed.initialize`, a global mesh spanning all slices, and
rank-0 gating for logging/checkpointing (replacing Lightning's
rank_zero_only / Accelerate's is_main_process — reference
train_aa_effects.py:123, aa_mixer.py:437).
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Initialise multi-process jax when env/args describe a cluster.

    Uses explicit args, else JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID env vars, else no-ops (single host). Returns True when
    running distributed.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    if not coordinator or num_processes <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def is_main_process() -> bool:
    """Rank-0 gate (HostPrinter / rank_zero_only capability)."""
    return jax.process_index() == 0


class HostPrinter:
    """Print only on the main process (aeiou.hpc.HostPrinter capability,
    reference aa_mixer.py:34)."""

    def __init__(self, prefix: str = ""):
        self.prefix = prefix

    def __call__(self, *args, **kwargs):
        if is_main_process():
            print(self.prefix, *args, **kwargs)


def global_batch_sharding(mesh, per_host_batch: int):
    """Make a host-local batch into a globally-sharded array
    (multi-host data parallelism: each host feeds its shard).
    `per_host_batch` is validated against every batch placed — a loader
    that drifts from the agreed shard size would otherwise desync the
    global array layout across hosts."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def place(local_batch):
        import jax.numpy as jnp

        local_batch = jnp.asarray(local_batch)
        if local_batch.shape[0] != per_host_batch:
            raise ValueError(
                f"local batch {local_batch.shape[0]} != agreed "
                f"per_host_batch {per_host_batch}")
        if jax.process_count() == 1:
            return jax.device_put(local_batch,
                                  NamedSharding(mesh, P("data")))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data")), local_batch)

    return place
