"""FSDP-style sharded train state (ZeRO-3 capability).

Why: the CLAPDAE generator trainer is memory-bound by its f32 train state,
not by activations — 498.6M params mean params + EMA + Adam m/v =
~7.4 GiB resident per chip when replicated, which is what caps the
single-chip batch at 16 (measured r5: B=32 OOMs even with flash attention
AND per-block remat — BASELINE.md "Flash-attention training A/B"). The
reference has no equivalent: torch DDP replicates optimizer state and it
simply caps the batch (reference train_aa_mixer.py:147-159).

The TPU-native fix is sharding the STATE over the data axis and letting
XLA's SPMD partitioner insert the collectives: each leaf of
params/EMA/opt-state is sharded along its largest dimension divisible by
the axis size (replicating only tiny/indivisible leaves), the jitted step
declares those shardings for state inputs AND outputs, and XLA emits
all-gathers at parameter use and reduce-scatters for the gradients —
ZeRO-3 without hand-written communication. On an 8-chip mesh the resident
state drops ~8x (to ~1 GiB), freeing ~6 GiB/chip for batch growth.

Used by train_clapdae.py (--fsdp 1) and exercised against the replicated
step for update-equality in tests/test_parallel.py and the driver dryrun.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["fsdp_sharding", "shard_state", "state_bytes_per_device"]


def _leaf_spec(shape, n_shards: int, axis: str, min_size: int):
    """PartitionSpec sharding the largest divisible dim, or replicated."""
    if int(np.prod(shape, dtype=np.int64)) < min_size:
        return P()
    best = None
    for i, d in enumerate(shape):
        if d % n_shards == 0 and d >= n_shards:
            if best is None or d > shape[best]:
                best = i
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = axis
    return P(*spec)


def fsdp_sharding(tree, mesh: Mesh, axis: str = "data",
                  min_size: int = 2 ** 14):
    """A NamedSharding pytree for `tree`: every leaf sharded over
    mesh[`axis`] along its largest divisible dimension; leaves smaller
    than `min_size` elements (biases, norm scales, scalar counts)
    replicate — sharding them buys nothing and costs collective latency."""
    n = mesh.shape[axis]

    def one(x):
        shape = tuple(getattr(x, "shape", ()) or ())
        return NamedSharding(mesh, _leaf_spec(shape, n, axis, min_size))

    return jax.tree_util.tree_map(one, tree)


def shard_state(tree, mesh: Mesh, axis: str = "data",
                min_size: int = 2 ** 14):
    """device_put `tree` with fsdp_sharding. Returns (placed_tree,
    sharding_tree) — pass the sharding tree to jax.jit's in_shardings /
    out_shardings for the state arguments so the state STAYS sharded
    across steps instead of being resharded by propagation drift."""
    sh = fsdp_sharding(tree, mesh, axis, min_size)
    placed = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(jnp.asarray(x), s), tree, sh)
    return placed, sh


def state_bytes_per_device(tree, mesh: Mesh, axis: str = "data",
                           min_size: int = 2 ** 14) -> int:
    """Resident bytes per device under fsdp_sharding (for logging)."""
    n = mesh.shape[axis]
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        shape = tuple(getattr(leaf, "shape", ()) or ())
        nbytes = int(np.prod(shape, dtype=np.int64)) * \
            jnp.dtype(getattr(leaf, "dtype", jnp.float32)).itemsize
        spec = _leaf_spec(shape, n, axis, min_size)
        total += nbytes // (n if any(s is not None for s in spec) else 1)
    return total
