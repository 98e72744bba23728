"""Sharded training step factory.

`make_data_parallel_step(loss_fn, optimizer, mesh)` returns a jitted step
whose batch arguments are sharded over the mesh's 'data' axis and whose
params/opt-state are replicated. XLA inserts the gradient all-reduce
(psum over ICI) — the explicit replacement for the reference's DDP/NCCL
gradient sync (reference train_aa_mixer.py:152, aa_mixer.py:388).

Gradient accumulation (`accum_batches`, reference defaults.ini:37 /
train_aa_mixer.py:154) is optax.MultiSteps. bf16 compute with f32 params
mirrors the reference's precision=16 AMP training.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def host_device_count() -> int:
    return len(jax.devices())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host array on the mesh, sharded along the leading dim."""
    def put(x):
        x = jnp.asarray(x)
        return jax.device_put(x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))))
    return jax.tree_util.tree_map(put, batch)


def make_data_parallel_step(loss_fn: Callable, optimizer, mesh: Mesh,
                            accum_steps: int = 1,
                            compute_dtype=None,
                            donate: bool = True) -> Callable:
    """Build `step(params, opt_state, *batch_args) -> (params, opt_state,
    logs)` jitted with dp shardings over `mesh`.

    loss_fn: (params, *batch_args) -> (loss, logs dict).
    """
    import optax

    if accum_steps > 1:
        optimizer = optax.MultiSteps(optimizer, every_k_schedule=accum_steps)

    repl = NamedSharding(mesh, P())

    def step(params, opt_state, *batch_args):
        def cast(x):
            if compute_dtype is not None and jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(compute_dtype)
            return x
        batch_args = jax.tree_util.tree_map(cast, batch_args)
        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, *batch_args)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, logs

    # params/opt replicated; batch args sharded on their leading dim when it
    # divides the data axis (small non-batch args like fader vectors replicate)
    data_size = mesh.shape["data"]

    def _arg_sharding(x):
        if jnp.ndim(x) >= 1 and jnp.shape(x)[0] % data_size == 0 \
                and jnp.shape(x)[0] >= data_size:
            return NamedSharding(mesh, P("data", *([None] * (jnp.ndim(x) - 1))))
        return repl

    jitted = jax.jit(
        step,
        in_shardings=None,   # inferred from operands (params replicated via device_put)
        donate_argnums=(0, 1) if donate else (),
    )

    def run(params, opt_state, *batch_args):
        batch_args = tuple(
            jax.tree_util.tree_map(
                lambda x: jax.device_put(jnp.asarray(x), _arg_sharding(x)), a)
            for a in batch_args)
        return jitted(params, opt_state, *batch_args)

    run.inner = jitted
    # the optimizer actually used inside the step (MultiSteps-wrapped when
    # accum_steps > 1) — callers MUST init/checkpoint opt_state from this,
    # not from the optimizer they passed in
    run.optimizer = optimizer
    return run


def replicate_state(state, mesh: Mesh):
    """Fully replicate a pytree (params/opt state) over the mesh."""
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(jnp.asarray(x), repl), state)
