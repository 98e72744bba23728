#!/usr/bin/env python
"""Benchmark: the north-star encode -> latent-op -> decode pipeline.

Measures audio-seconds-per-second-per-chip for the Destructo pipeline
(BASELINE.json north_star: >=100x realtime on one TPU v5e chip): DVAE
encode (SoundStreamXL, /128) -> mathemangle latent op -> 35-step v-DDIM
diffusion decode (DiffusionAttnUnet1D, reference Destructo.ipynb cell 18
default steps=35, max batch 8 chunks of 65536 samples @48k, cell 17).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 100 (the driver's 100x realtime target; the torch
reference publishes no numbers — BASELINE.md).

Runs in bf16 compute. Whole pipeline is a single jit program (encode +
latent op + scan-of-35-UNet-steps), so steady-state timing excludes
compile and host round-trips.
"""
import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="tiny config (CI smoke; not a perf number)")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=35)
    ap.add_argument("--sample-size", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from audio_algebra_tpu.models.dvae import DiffusionDVAE
    from audio_algebra_tpu.samplers.vddim import sample as vddim_sample

    if args.quick:
        model = DiffusionDVAE(latent_dim=8, capacity=4, c_mults=(2, 4),
                              strides=(4, 2), n_attn_layers=1,
                              diffusion_c_mults=(8, 16, 16))
        args.batch, args.sample_size, args.steps = 2, 2048, 3
    else:
        model = DiffusionDVAE()          # reference config: /128, latent 64

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    sr = 48000
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((args.batch, 2, args.sample_size)).astype(np.float32)
    audio = np.tanh(audio) * 0.5

    from audio_algebra_tpu.utils.params import fast_random_params

    params = fast_random_params(model, 0, jnp.zeros((1, 2, args.sample_size)),
                                jnp.zeros((1,)))
    params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
    noise = jax.random.normal(jax.random.PRNGKey(1),
                              (args.batch, 2, args.sample_size), dtype)

    @jax.jit
    def pipeline(p, x, n):
        emb = model.apply(p, x.astype(dtype), method=DiffusionDVAE.encode_it)
        emb = -emb                                   # Destructo mathemangle op
        model_fn = lambda xx, tt, cond: model.apply(
            p, xx, tt, cond, method=DiffusionDVAE.decode_v)
        fakes = vddim_sample(model_fn, n, args.steps, 0, emb)
        return emb, fakes

    def fetch(v):
        # force a real device->host value fetch: on the axon backend,
        # block_until_ready returns before execution completes (measured),
        # so timing MUST synchronise through a value read
        return float(jnp.abs(v[..., :8]).sum())

    x = jnp.asarray(audio)
    t0 = time.time()
    emb, fakes = pipeline(params, x, noise)
    fetch(fakes)
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(args.iters):
        emb, fakes = pipeline(params, x, noise)
        fetch(fakes)
    dt = (time.time() - t0) / args.iters

    audio_sec = args.batch * args.sample_size / sr
    rt = audio_sec / dt
    result = {
        "metric": "rt_factor_encode_matherm_decode35",
        "value": round(rt, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rt / 100.0, 3),
    }
    print(json.dumps(result))
    print(f"# compile={compile_s:.1f}s step={dt*1e3:.1f}ms "
          f"batch={args.batch} steps={args.steps} dtype={args.dtype} "
          f"emb={tuple(emb.shape)} out={tuple(fakes.shape)}", file=sys.stderr)
    # secondary: encode-only throughput (the corpus-extraction config in
    # BASELINE.json — calc_effects_pca / aa training run this path)
    if not args.quick:
        enc = jax.jit(lambda p, a: model.apply(p, a.astype(dtype),
                                               method=DiffusionDVAE.encode_it))
        e = enc(params, x)
        fetch(e)
        t0 = time.time()
        for _ in range(args.iters):
            e = enc(params, x)
            fetch(e)
        dt_enc = (time.time() - t0) / args.iters
        print(f"# secondary encode_only_rt={audio_sec/dt_enc:.0f}x_realtime "
              f"({dt_enc*1e3:.1f}ms/batch)", file=sys.stderr)
    # physics note: the reference UNet is ~1.85 TFLOP/forward; 35 steps of
    # it caps at ~4x realtime on one v5e even at 100% MXU — see BASELINE.md


if __name__ == "__main__":
    main()
