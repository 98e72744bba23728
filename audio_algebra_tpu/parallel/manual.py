"""Manual shard_map DDP step — the explicitly-written-collectives variant.

The canonical path (parallel/train.make_data_parallel_step) annotates
shardings on a jitted step and lets XLA *infer* the gradient all-reduce.
This module is the other idiomatic TPU formulation: a `jax.shard_map`
per-device function that computes the gradient on its local batch shard
and `jax.lax.pmean`s it over the 'data' mesh axis by hand. It is the
TPU-native equivalent of the reference's HF-Accelerate manual training
loop (reference train_aa_mixer_accel.py:463-553), where
`accelerator.backward` hides exactly this all-reduce; here the collective
is written out, which also makes it the natural place to hang
compression/async tricks later.

Semantics match torch DDP / Accelerate exactly, including the classic
caveat: the loss is evaluated on each device's LOCAL batch shard, so
batch-coupled terms (the mixer loss's VICReg variance/covariance over
the batch dim) see local statistics, just as they do per-GPU under the
reference's DDP. For per-example-decomposable losses the update is
identical to the annotated step and to single-device execution
(tests/test_parallel.py asserts this); for VICReg-style losses the
annotated step (global-batch statistics via XLA-inserted collectives)
is the stronger formulation — that difference is a feature of the
TPU-native path, not a bug here. train_aa_mixer.py uses the annotated
step, train_aa_mixer_accel.py this one.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_manual_ddp_step(loss_fn: Callable, optimizer, mesh: Mesh,
                         accum_steps: int = 1,
                         compute_dtype=None,
                         arg_specs=None) -> Callable:
    """Build `step(params, opt_state, *batch_args) -> (params, opt_state,
    logs)` as a shard_map over `mesh`'s 'data' axis with an explicit
    gradient pmean.

    loss_fn: (params, *batch_args) -> (loss, logs dict). Batch args are
    auto-sharded on their leading dim when rank >= 2 and it divides the
    data axis; rank-1 args (fader vectors etc.) are replicated by default
    — so a PER-EXAMPLE rank-1 arg like a (B,) diffusion-timestep vector
    MUST be given an explicit spec or the per-device loss sees full-B
    timesteps against B/n latents and fails to broadcast.

    arg_specs: optional tuple, one entry per batch arg: a PartitionSpec
    (applied to every leaf of that arg) or None for the auto rule.
    E.g. `arg_specs=(None, P("data"))` shards a (B,) second arg while the
    first keeps the auto leading-dim rule.
    """
    import optax

    if accum_steps > 1:
        optimizer = optax.MultiSteps(optimizer, every_k_schedule=accum_steps)

    data_size = mesh.shape["data"]

    def _arg_spec(x):
        # Auto rule: shard only rank>=2 args on their leading dim. Under
        # shard_map the in_spec CHANGES SEMANTICS (each device sees its
        # slice), unlike the annotated step where a sharding is just
        # layout — a 1-D vector like the (nstems,) faders must stay
        # replicated even when its length happens to divide the device
        # count (on a 2-device mesh, splitting faders (2,) silently
        # mis-mixes both stems with one fader each; reproduced, see
        # tests/test_parallel.py). Per-example rank-1 args opt in via
        # `arg_specs` instead — shape alone cannot tell a (B,) timestep
        # vector from an (nstems,) hyperparameter vector.
        if jnp.ndim(x) >= 2 and jnp.shape(x)[0] % data_size == 0 \
                and jnp.shape(x)[0] >= data_size:
            return P("data", *([None] * (jnp.ndim(x) - 1)))
        return P()

    def _spec_for(i, x):
        if arg_specs is not None and arg_specs[i] is not None:
            return arg_specs[i]
        return _arg_spec(x)

    def per_device(params, opt_state, *batch_args):
        def cast(x):
            if compute_dtype is not None and jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(compute_dtype)
            return x
        batch_args = jax.tree_util.tree_map(cast, batch_args)
        (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, *batch_args)
        # THE collective: global-mean gradient over the data axis (what
        # DDP/Accelerate's backward does behind the scenes)
        grads = jax.lax.pmean(grads, "data")
        logs = jax.lax.pmean(logs, "data")
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, logs

    jitted_cache = {}

    def run(params, opt_state, *batch_args):
        placed = tuple(
            jax.tree_util.tree_map(
                lambda x, i=i: jax.device_put(
                    jnp.asarray(x), NamedSharding(mesh, _spec_for(i, x))), a)
            for i, a in enumerate(batch_args))
        batch_specs = tuple(
            jax.tree_util.tree_map(lambda x, i=i: _spec_for(i, x), a)
            for i, a in enumerate(placed))
        # key must include the specs: a final partial batch can flip an
        # arg from sharded to replicated with the same tree structure
        key = (jax.tree_util.tree_structure((params, opt_state, placed)),
               str(batch_specs))
        if key not in jitted_cache:
            repl = jax.tree_util.tree_map(lambda _: P(), (params, opt_state))
            fn = jax.shard_map(
                per_device, mesh=mesh,
                in_specs=repl + batch_specs,
                out_specs=(P(), P(), P()),
                check_vma=False,   # optimizer update of pmean'd grads on
                                   # replicated state is replicated; skip
                                   # the conservative varying-axes check
            )
            jitted_cache[key] = jax.jit(fn, donate_argnums=(0, 1))
        return jitted_cache[key](params, opt_state, *placed)

    run.optimizer = optimizer
    return run
