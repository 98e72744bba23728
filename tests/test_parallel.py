"""Sharding tests on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from audio_algebra_tpu.parallel import (
    make_mesh, batch_sharding, replicated,
    make_data_parallel_step, shard_batch,
)
from audio_algebra_tpu.parallel.train import replicate_state
from audio_algebra_tpu.aa_mixer import AABundle, make_mixer_loss_fn


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.axis_names == ("data",) and mesh.devices.shape == (8,)
    mesh2 = make_mesh(axis_names=("data", "model"), shape=(4, 2))
    assert mesh2.devices.shape == (4, 2)


def test_shard_batch_places_on_devices():
    mesh = make_mesh()
    x = np.ones((16, 2, 64), np.float32)
    sx = shard_batch(x, mesh)
    assert sx.sharding.spec == jax.sharding.PartitionSpec("data", None, None)
    assert len(sx.addressable_shards) == 8
    assert sx.addressable_shards[0].data.shape == (2, 2, 64)


@pytest.mark.slow
def test_data_parallel_step_matches_single_device():
    """The dp step over 8 devices must produce the same update as single-
    device execution — the psum the shardings induce is a mean-preserving
    all-reduce."""
    mesh = make_mesh()

    class LinearEnc:
        def encode(self, x):
            return x[..., ::32]

    aa = AABundle(dims=2, hidden_dims=4)
    enc = LinearEnc()
    loss_fn = make_mixer_loss_fn(aa.module, enc.encode)
    opt = optax.sgd(1e-2)

    rng = np.random.default_rng(0)
    stems = rng.standard_normal((2, 16, 2, 256)).astype(np.float32)
    faders = np.asarray([1.0, -1.0], np.float32)
    batch = stems[0]

    # single-device reference update
    params0 = aa.params
    opt_state0 = opt.init(params0)
    (l0, _), g0 = jax.value_and_grad(loss_fn, has_aux=True)(
        params0, jnp.asarray(stems), jnp.asarray(faders), jnp.asarray(batch))
    upd0, _ = opt.update(g0, opt_state0, params0)
    ref = optax.apply_updates(params0, upd0)

    # sharded step (faders replicated: pass via closure-style leading dim trick)
    step = make_data_parallel_step(
        lambda p, s, b: loss_fn(p, s, jnp.asarray(faders), b), opt, mesh)
    params = replicate_state(aa.params, mesh)
    opt_state = replicate_state(opt.init(aa.params), mesh)
    # stems has leading dim 2 (=S) — shard the batch axis instead by moving
    # batch leading: reshape so arg leading dims are device-divisible
    stems_b = np.swapaxes(stems, 0, 1)    # (16, 2, 2, 256) batch-leading
    step2 = make_data_parallel_step(
        lambda p, sb, b: loss_fn(p, jnp.swapaxes(sb, 0, 1),
                                 jnp.asarray(faders), b), opt, mesh)
    new_params, _, logs = step2(params, opt_state, stems_b, batch)

    flat_ref = jax.tree_util.tree_leaves(ref)
    flat_new = jax.tree_util.tree_leaves(new_params)
    for a, b in zip(flat_ref, flat_new):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_manual_shard_map_step_matches_annotated():
    """The explicit-collectives variant (shard_map + lax.pmean, used by
    train_aa_mixer_accel.py) must produce the same update as the
    sharding-annotated step for a per-example-decomposable loss — the DDP
    equivalence class. (Batch-coupled losses like the mixer's VICReg terms
    legitimately differ: manual = local-shard statistics, exactly like
    torch DDP per-GPU; annotated = global-batch statistics.)"""
    from audio_algebra_tpu.parallel.manual import make_manual_ddp_step

    mesh = make_mesh()
    rng = np.random.default_rng(0)
    w0 = {"w": rng.standard_normal((8, 4)).astype(np.float32),
          "b": np.zeros((4,), np.float32)}
    x = rng.standard_normal((16, 8)).astype(np.float32)
    y = rng.standard_normal((16, 4)).astype(np.float32)

    def loss_fn(p, xb, yb):
        pred = xb @ p["w"] + p["b"]
        loss = jnp.mean((pred - yb) ** 2)
        return loss, {"train_loss": loss}

    opt = optax.sgd(1e-1)
    annotated = make_data_parallel_step(loss_fn, opt, mesh)
    manual = make_manual_ddp_step(loss_fn, opt, mesh)

    p_a, _, logs_a = annotated(replicate_state(w0, mesh),
                               replicate_state(opt.init(w0), mesh), x, y)
    p_m, _, logs_m = manual(replicate_state(w0, mesh),
                            replicate_state(opt.init(w0), mesh), x, y)

    for a, b in zip(jax.tree_util.tree_leaves(p_a),
                    jax.tree_util.tree_leaves(p_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(logs_a["train_loss"]),
                               float(logs_m["train_loss"]),
                               rtol=1e-5, atol=1e-7)


def test_manual_step_replicates_small_vectors_on_tiny_mesh():
    """Regression: on a 2-device mesh, a 1-D arg whose length happens to
    divide the device count (the (nstems,) fader vector) must stay
    REPLICATED — under shard_map an in_spec changes semantics, and
    splitting faders silently mis-mixes stems (each device would see one
    fader broadcast over both stems). manual must equal annotated for a
    per-example loss with such an arg."""
    from audio_algebra_tpu.parallel.manual import make_manual_ddp_step

    mesh = make_mesh(n_devices=2)
    rng = np.random.default_rng(0)
    w0 = {"w": rng.standard_normal((4, 3)).astype(np.float32)}
    x = rng.standard_normal((8, 2, 4)).astype(np.float32)   # (B, S, F)
    gains = np.asarray([1.0, -0.5], np.float32)             # (S,) == n_dev!

    def loss_fn(p, xb, g):
        mixed = jnp.einsum("bsf,s->bf", xb, g)              # uses BOTH gains
        pred = mixed @ p["w"]
        loss = jnp.mean(pred ** 2)
        return loss, {"train_loss": loss}

    opt = optax.sgd(1e-1)
    annotated = make_data_parallel_step(loss_fn, opt, mesh)
    manual = make_manual_ddp_step(loss_fn, opt, mesh)
    p_a, _, _ = annotated(replicate_state(w0, mesh),
                          replicate_state(opt.init(w0), mesh), x, gains)
    p_m, _, _ = manual(replicate_state(w0, mesh),
                       replicate_state(opt.init(w0), mesh), x, gains)
    np.testing.assert_allclose(np.asarray(p_a["w"]), np.asarray(p_m["w"]),
                               rtol=1e-5, atol=1e-6)


def test_manual_step_arg_specs_shard_per_example_vector():
    """A per-example rank-1 arg (a (B,) diffusion-timestep vector) breaks
    the auto rule (it would be replicated at full B against B/n latents) —
    `arg_specs` must let the caller shard it, and the update must equal
    the annotated step's."""
    from jax.sharding import PartitionSpec as P
    from audio_algebra_tpu.parallel.manual import make_manual_ddp_step

    mesh = make_mesh()
    rng = np.random.default_rng(1)
    w0 = {"w": rng.standard_normal((6, 3)).astype(np.float32)}
    x = rng.standard_normal((16, 6, 4)).astype(np.float32)   # (B, C, T)
    t = rng.uniform(0, 1, (16,)).astype(np.float32)          # (B,) per-example

    def loss_fn(p, xb, tb):
        # alphas (B,1,1) against (B, C, T): fails under the auto rule
        # (full-B tb vs B/n xb) — the v-objective broadcasting pattern
        alphas = jnp.cos(tb * jnp.pi / 2)[:, None, None]
        h = jnp.einsum("bct,cf->bft", xb * alphas, p["w"])
        loss = jnp.mean(h ** 2)
        return loss, {"train_loss": loss}

    opt = optax.sgd(1e-1)
    annotated = make_data_parallel_step(loss_fn, opt, mesh)
    manual = make_manual_ddp_step(loss_fn, opt, mesh,
                                  arg_specs=(None, P("data")))
    p_a, _, _ = annotated(replicate_state(w0, mesh),
                          replicate_state(opt.init(w0), mesh), x, t)
    p_m, _, _ = manual(replicate_state(w0, mesh),
                       replicate_state(opt.init(w0), mesh), x, t)
    np.testing.assert_allclose(np.asarray(p_a["w"]), np.asarray(p_m["w"]),
                               rtol=1e-5, atol=1e-6)


def test_manual_shard_map_step_mixer_loss_runs():
    """Manual DDP over the real mixer loss: runs, logs finite, loss drops
    over a few steps (local-shard VICReg semantics — the reference's DDP
    behavior, reference train_aa_mixer_accel.py:463-553)."""
    from audio_algebra_tpu.parallel.manual import make_manual_ddp_step

    mesh = make_mesh()

    class LinearEnc:
        def encode(self, x):
            return x[..., ::32]

    aa = AABundle(dims=2, hidden_dims=4)
    loss_fn = make_mixer_loss_fn(aa.module, LinearEnc().encode)
    opt = optax.adam(1e-3)

    rng = np.random.default_rng(0)
    stems = rng.standard_normal((2, 16, 2, 256)).astype(np.float32)
    faders = np.asarray([1.0, -1.0], np.float32)
    stems_b = np.swapaxes(stems, 0, 1)
    wrapped = lambda p, sb, b: loss_fn(p, jnp.swapaxes(sb, 0, 1),
                                       jnp.asarray(faders), b)

    manual = make_manual_ddp_step(wrapped, opt, mesh)
    params = replicate_state(jax.device_get(aa.params), mesh)
    opt_state = replicate_state(
        jax.device_get(opt.init(aa.params)), mesh)

    losses = []
    for _ in range(5):
        params, opt_state, logs = manual(params, opt_state,
                                         stems_b, stems[0])
        losses.append(float(logs["train_loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_grad_accumulation_multisteps():
    mesh = make_mesh()
    params = {"w": jnp.ones((4,))}
    opt = optax.sgd(0.1)

    def loss_fn(p, x):
        return jnp.mean((x @ p["w"]) ** 2), {}

    step = make_data_parallel_step(loss_fn, opt, mesh, accum_steps=2)
    import optax as ox
    multi = ox.MultiSteps(ox.sgd(0.1), every_k_schedule=2)
    opt_state = replicate_state(multi.init(params), mesh)
    p = replicate_state(params, mesh)
    x = np.ones((8, 4), np.float32)
    p1, opt_state, _ = step(p, opt_state, x)
    # first micro-step: params unchanged (accumulating)
    np.testing.assert_allclose(np.asarray(p1["w"]), 1.0)
    p2, opt_state, _ = step(p1, opt_state, x)
    assert not np.allclose(np.asarray(p2["w"]), 1.0)


def test_bf16_compute_path():
    mesh = make_mesh()
    params = {"w": jnp.ones((4,), jnp.float32)}
    opt = optax.sgd(0.1)

    def loss_fn(p, x):
        assert x.dtype == jnp.bfloat16
        return jnp.mean((x.astype(jnp.float32) @ p["w"]) ** 2), {}

    step = make_data_parallel_step(loss_fn, opt, mesh,
                                   compute_dtype=jnp.bfloat16)
    p = replicate_state(params, mesh)
    s = replicate_state(opt.init(params), mesh)
    p1, _, _ = step(p, s, np.ones((8, 4), np.float32))
    assert jax.tree_util.tree_leaves(p1)[0].dtype == jnp.float32


@pytest.mark.slow
def test_fsdp_step_matches_replicated():
    """ZeRO-3 state sharding (parallel/fsdp.py): the CLAPDAE-style train
    step with params/EMA/Adam state sharded over the data axis must
    produce the same update as the replicated step — XLA's declared-
    sharding collectives (all-gather at use, reduce-scatter on grads) are
    numerically the identity reorganisation."""
    from audio_algebra_tpu.models.stacked import (StackedAELatentDiffusionCond,
                                                  v_objective_loss)
    from audio_algebra_tpu.models.ema import EMASchedule
    from audio_algebra_tpu.parallel.fsdp import (fsdp_sharding, shard_state,
                                                 state_bytes_per_device)
    from audio_algebra_tpu.utils.params import fast_random_params
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh()
    ldm = StackedAELatentDiffusionCond(
        latent_dim=8, channels=16, multipliers=(1, 2), factors=(2,),
        num_blocks=(1,), attentions=(0, 1), resnet_groups=4,
        attention_heads=2, attention_features=8)
    params = fast_random_params(
        ldm, 0, jnp.zeros((1, 8, 64)), jnp.zeros((1,)),
        embedding=jnp.zeros((1, 1, 512)))
    opt = optax.adam(1e-3)
    ema_sched = EMASchedule()
    apply = lambda p, x, t, **kw: ldm.apply(p, x, t, **kw)

    def step_fn(params, ema, opt_state, latents, emb, t, noise, key):
        loss, grads = jax.value_and_grad(lambda p: v_objective_loss(
            apply, p, latents, emb, t, noise, key,
            embedding_mask_proba=0.1))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = ema_sched.update(params, ema, 1)
        return params, ema, opt_state, loss

    rng = np.random.default_rng(0)
    B = 8
    latents = jnp.asarray(rng.standard_normal((B, 8, 64)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((B, 1, 512)), jnp.float32)
    t = jnp.asarray(rng.uniform(0, 1, (B,)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((B, 8, 64)), jnp.float32)
    key = jax.random.PRNGKey(3)

    # reference: plain replicated jit
    ema0 = jax.tree_util.tree_map(jnp.copy, params)
    want_p, want_e, want_o, want_l = jax.jit(step_fn)(
        params, ema0, opt.init(params), latents, emb, t, noise, key)

    # fsdp: min_size tiny so even this small model actually shards
    kw = dict(min_size=8)
    sp, p_sh = shard_state(params, mesh, **kw)
    se, e_sh = shard_state(ema0, mesh, **kw)
    so, o_sh = shard_state(opt.init(params), mesh, **kw)
    # at least one big leaf must actually be sharded (not all-replicated)
    specs = {s.spec for s in jax.tree_util.tree_leaves(p_sh)}
    assert any(any(ax is not None for ax in spec) for spec in specs)
    # resident bytes drop vs replicated
    full = sum(np.prod(l.shape) * 4 for l in jax.tree_util.tree_leaves(params))
    assert state_bytes_per_device(params, mesh, min_size=8) < full
    dp = NamedSharding(mesh, P("data"))
    fsdp_step = jax.jit(step_fn,
                        in_shardings=(p_sh, e_sh, o_sh) + (None,) * 5,
                        out_shardings=(p_sh, e_sh, o_sh, None))
    got_p, got_e, got_o, got_l = fsdp_step(
        sp, se, so, jax.device_put(latents, dp), jax.device_put(emb, dp),
        jax.device_put(t, dp), jax.device_put(noise, dp), key)

    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-5)
    for got, want in ((got_p, want_p), (got_e, want_e)):
        ga = jax.tree_util.tree_leaves(jax.tree_util.tree_map(np.asarray, got))
        wa = jax.tree_util.tree_leaves(jax.tree_util.tree_map(np.asarray, want))
        for g, w in zip(ga, wa):
            np.testing.assert_allclose(g, w, rtol=2e-4, atol=1e-6)
    # outputs keep the declared shardings (state STAYS sharded step-over-step)
    out_specs = {s.sharding.spec
                 for s in jax.tree_util.tree_leaves(got_p)
                 if hasattr(s, "sharding")}
    assert any(any(ax is not None for ax in spec) for spec in out_specs)
