#!/usr/bin/env python
"""Training-step benchmarks on the chip — the reference's dominant workload.

Two steps, timed steady-state on the real device:

  * clapdae: the MIRAGE generator training step (v-objective MSE with 0.1
    CFG dropout + Adam + EMA(β .9999, p ¾)) on the reference 'songs'
    UNetCFG1d config over (B, 32, 2048) latents — the 22 s model's latent
    grid (reference StackedAELatentDiffusionCond.py:348-394, trained by
    train_clapdae.py). The frozen first-stage encode ((B, 2, 1048576) →
    latents) is timed separately: the reference runs it under no_grad
    inside its step (:357-361); here it is its own jit program.
  * aa-mixer: the AudioAlgebra VICReg step with the FROZEN DVAE encoder
    inside the loss (reference train_aa_mixer.py:50-81; per-GPU batch =
    1024/8 = 128 at 65536 samples, defaults.ini:13-19). S=2 stems → 2B+B
    encoder forwards + the MLP fwd/bwd per step.

Mixed precision follows the trainers: f32 master params + f32 Adam state,
bf16 compute (the reference trains fp16 autocast, precision=16 —
train_aa_mixer.py:153). MFU comes from XLA's own cost analysis of the
compiled step (flops / wall / 197 TF/s bf16 peak on v5e).

Usage: python tools/bench_train.py [--quick] [--clapdae-batch N]
       [--mixer-batch N] [--iters N]
Each result prints as one JSON line; bench.py re-emits them as commented
secondary metrics.
"""
import argparse
import functools
import json
import sys
import time

import numpy as np

PEAK_TFLOPS_BF16 = 197.0


def _fetch(v):
    """Force a device->host read (axon's block_until_ready returns early)."""
    import jax.numpy as jnp
    return float(jnp.abs(jnp.asarray(v).ravel()[:8]).sum())


def _flops_of(jitted, *args, **kwargs):
    """XLA cost-analysis flops of one call (None when unavailable)."""
    try:
        c = jitted.lower(*args, **kwargs).compile()
        an = c.cost_analysis()
        if isinstance(an, (list, tuple)):
            an = an[0]
        return float(an["flops"])
    except Exception:
        return None


def bench_clapdae_step(batch: int, iters: int, quick: bool):
    import jax
    import jax.numpy as jnp
    import optax

    from audio_algebra_tpu.models.stacked import (
        LatentAudioDiffusionAutoencoder, StackedAELatentDiffusionCond,
        v_objective_loss)
    from audio_algebra_tpu.models.ema import EMASchedule
    from audio_algebra_tpu.utils.params import fast_random_params

    if quick:
        ldm = StackedAELatentDiffusionCond(
            latent_dim=8, channels=16, multipliers=(1, 2), factors=(2,),
            num_blocks=(1,), attentions=(0, 1), resnet_groups=4,
            attention_heads=2, attention_features=8)
        lat_shape = (batch, 8, 64)
    else:
        ldm = StackedAELatentDiffusionCond()      # 'songs' config defaults
        lat_shape = (batch, 32, 2048)             # 22 s model latent grid

    params = fast_random_params(
        ldm, 0, jnp.zeros((1,) + lat_shape[1:]), jnp.zeros((1,)),
        embedding=jnp.zeros((1, 1, 512)))
    opt = optax.adam(4e-5)
    opt_state = opt.init(params)
    ema_params = jax.tree_util.tree_map(jnp.copy, params)
    ema_sched = EMASchedule(beta=0.9999, power=0.75)

    def model_apply(p, x, t, **kw):
        # bf16 compute on f32 master params (autocast-equivalent)
        pb = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, p)
        v = ldm.apply(pb, x.astype(jnp.bfloat16), t, **kw)
        return v.astype(jnp.float32)

    def step_fn(params, ema_params, opt_state, step_idx, latents, emb, t,
                noise, key):
        def loss_fn(p):
            return v_objective_loss(model_apply, p, latents, emb, t, noise,
                                    key, embedding_mask_proba=0.1)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema_params = ema_sched.update(params, ema_params, step_idx)
        return params, ema_params, opt_state, loss

    jitted = jax.jit(step_fn, donate_argnums=(0, 1, 2))

    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.standard_normal(lat_shape), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((batch, 1, 512)), jnp.float32)
    t = jnp.asarray(rng.uniform(0, 1, (batch,)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal(lat_shape), jnp.float32)
    from audio_algebra_tpu.utils.prng import host_key
    key = host_key(1)

    flops = _flops_of(jitted, params, ema_params, opt_state, 0,
                      latents, emb, t, noise, key)
    t0 = time.time()
    params, ema_params, opt_state, loss = jitted(
        params, ema_params, opt_state, 0, latents, emb, t, noise, key)
    _fetch(loss)
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(iters):
        params, ema_params, opt_state, loss = jitted(
            params, ema_params, opt_state, i + 1, latents, emb, t, noise, key)
        _fetch(loss)
    dt = (time.time() - t0) / iters

    out = {"metric": "train_clapdae_step_ms", "value": round(dt * 1e3, 1),
           "unit": "ms_per_step",
           "note": f"batch={batch} latents={lat_shape[1:]}, "
                   f"examples/s={batch/dt:.1f}, compile={compile_s:.1f}s"}
    if flops:
        out["train_mfu"] = round(flops / dt / (PEAK_TFLOPS_BF16 * 1e12), 3)
    return out


def bench_mixer_step(batch: int, iters: int, quick: bool):
    import jax
    import jax.numpy as jnp
    import optax

    from audio_algebra_tpu.aa_mixer import AABundle, make_mixer_loss_fn
    from audio_algebra_tpu.models.dvae import DiffusionDVAE
    from audio_algebra_tpu.utils.params import fast_random_params

    sample_size = 2048 if quick else 65536
    if quick:
        dvae = DiffusionDVAE(latent_dim=8, capacity=4, c_mults=(2, 4),
                             strides=(4, 2), n_attn_layers=1,
                             diffusion_c_mults=(8, 16, 16))
        latent_dim = 8
    else:
        dvae = DiffusionDVAE()                    # reference: /128, latent 64
        latent_dim = 64

    enc_params = fast_random_params(
        dvae, 0, jnp.zeros((1, 2, sample_size)), jnp.zeros((1,)))
    enc_params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, enc_params)
    aa = AABundle(dims=latent_dim, hidden_dims=latent_dim)
    aa_params = aa.params

    def encode_fn(x):
        return dvae.apply(enc_params, x.astype(jnp.bfloat16),
                          method=DiffusionDVAE.encode_it).astype(jnp.float32)

    loss_fn = make_mixer_loss_fn(aa.module, encode_fn)
    opt = optax.adam(5e-4)
    opt_state = opt.init(aa_params)

    def step_fn(params, opt_state, stems, faders, batch_x):
        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, stems, faders, batch_x)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jitted = jax.jit(step_fn, donate_argnums=(0, 1))

    rng = np.random.default_rng(1)
    stems = jnp.asarray(rng.standard_normal((2, batch, 2, sample_size)),
                        jnp.float32) * 0.2
    faders = jnp.asarray([1.1, 0.8], jnp.float32)
    batch_x = jnp.asarray(rng.standard_normal((batch, 2, sample_size)),
                          jnp.float32) * 0.2

    flops = _flops_of(jitted, aa_params, opt_state, stems, faders, batch_x)
    t0 = time.time()
    aa_params, opt_state, loss = jitted(aa_params, opt_state, stems, faders,
                                        batch_x)
    _fetch(loss)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        aa_params, opt_state, loss = jitted(aa_params, opt_state, stems,
                                            faders, batch_x)
        _fetch(loss)
    dt = (time.time() - t0) / iters

    audio_sec = batch * sample_size / 48000
    out = {"metric": "train_aa_mixer_step_ms", "value": round(dt * 1e3, 1),
           "unit": "ms_per_step",
           "note": f"batch={batch} (S=2 stems, 3x{batch} frozen DVAE "
                   f"encodes inside), examples/s={batch/dt:.1f}, "
                   f"audio x_realtime={audio_sec/dt:.1f}, "
                   f"compile={compile_s:.1f}s"}
    if flops:
        out["train_mfu"] = round(flops / dt / (PEAK_TFLOPS_BF16 * 1e12), 3)
    return out


def bench_clapdae_frozen_encode(batch: int, iters: int):
    """The frozen first-stage encode feeding the clapdae step:
    (B, 2, 1048576) -> (B, 32, 2048)."""
    import jax
    import jax.numpy as jnp

    from audio_algebra_tpu.models.stacked import LatentAudioDiffusionAutoencoder
    from audio_algebra_tpu.utils.params import fast_random_params

    diffae = LatentAudioDiffusionAutoencoder()
    x0 = jnp.zeros((1, 2, 1048576))
    params = fast_random_params(diffae, 0, x0, jnp.zeros((1,)))
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
    enc = jax.jit(lambda p, x: diffae.apply(
        p, x.astype(jnp.bfloat16),
        method=LatentAudioDiffusionAutoencoder.encode))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((batch, 2, 1048576)), jnp.float32) * 0.2
    t0 = time.time()
    z = enc(params, x)
    _fetch(z)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        _fetch(enc(params, x))
    dt = (time.time() - t0) / iters
    audio_sec = batch * 1048576 / 48000
    return {"metric": "train_frozen_encode_ms", "value": round(dt * 1e3, 1),
            "unit": "ms_per_batch",
            "note": f"batch={batch} of 22 s clips -> (B, 32, 2048) latents, "
                    f"{audio_sec/dt:.0f}x realtime, compile={compile_s:.1f}s"}


def run_train_bench(quick: bool = False, clapdae_batch: int = 16,
                    mixer_batch: int = 128, iters: int = 3,
                    skip_encode: bool = False, only: str = ""):
    """Run all train benches, halving batch on OOM. Returns metric dicts."""
    results = []
    for name, fn, b in (
        ("clapdae", bench_clapdae_step, clapdae_batch),
        ("mixer", bench_mixer_step, mixer_batch),
    ):
        if only and name != only:
            continue
        while b >= 1:
            try:
                results.append(fn(b, iters, quick))
                break
            except Exception as e:
                msg = str(e)
                if "RESOURCE_EXHAUSTED" in msg or "out of memory" in msg.lower():
                    print(f"# {name} batch {b} OOM; retrying at {b//2}",
                          file=sys.stderr)
                    b //= 2
                else:
                    print(f"# {name} train bench failed: {type(e).__name__}: "
                          f"{msg[:200]}", file=sys.stderr)
                    break
    if not quick and not skip_encode and only in ("", "encode"):
        try:
            results.append(bench_clapdae_frozen_encode(
                max(clapdae_batch // 4, 1), iters))
        except Exception as e:
            print(f"# frozen-encode bench failed: {type(e).__name__}: "
                  f"{str(e)[:200]}", file=sys.stderr)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--clapdae-batch", type=int, default=16)
    ap.add_argument("--mixer-batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--skip-encode", action="store_true")
    ap.add_argument("--only", default="",
                    choices=["", "clapdae", "mixer", "encode"],
                    help="run a single bench (A/B experiments)")
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    for r in run_train_bench(args.quick, args.clapdae_batch,
                             args.mixer_batch, args.iters, args.skip_encode,
                             args.only):
        print(json.dumps(r))


if __name__ == "__main__":
    main()
