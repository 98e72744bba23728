#!/usr/bin/env python
"""Destructo — encode -> mathemangle -> diffusion-decode (CLI demo).

Script rebuild of the reference's flagship demo notebook (Destructo.ipynb,
"the one usable demo" per reference README.md:19-22): load audio, chunk it
(batch_it_crazy, max batch 8 — cell 17), DVAE-encode to (b, 64, 512)
embeddings, apply a "mathemangle" operation in latent space (cell 22), then
v-DDIM diffusion-decode (cell 30) and write the result.

Mathemangle ops (reference cell 22): destructo (sign flip), dimswap,
timereverse, ewma ("latent reverb"), overdrive (tanh), none, or an arbitrary
python expression over `z` via --op-expr (the reference's exec(op) box).

Effect-vector arithmetic (cells 42-54): --effect-dry/--effect-wet computes
diff = mean(encode(wet) − encode(dry)) and applies z + scale·diff.
"""
from __future__ import annotations

import argparse
import os
import json
import time

import numpy as np


def mathemangle(z, op: str, op_expr: str | None = None, key=None):
    """Latent ops from Destructo cell 22, as pure jnp transforms."""
    import jax
    import jax.numpy as jnp

    if op_expr:
        return eval(op_expr, {"z": z, "jnp": jnp, "np": np, "jax": jax})
    if op == "destructo":
        return -z
    if op == "dimswap":
        perm = np.random.default_rng(0).permutation(z.shape[1])
        return z[:, perm, :]
    if op == "timereverse":
        return z[..., ::-1]
    if op == "ewma":            # "latent reverb": exponential moving average
        alpha = 0.15

        def step(carry, x):
            out = alpha * x + (1 - alpha) * carry
            return out, out
        zt = jnp.moveaxis(z, -1, 0)
        _, out = jax.lax.scan(step, zt[0], zt)
        return jnp.moveaxis(out, 0, -1)
    if op == "overdrive":
        return jnp.tanh(3.0 * z)
    return z


def main():
    p = argparse.ArgumentParser()
    p.add_argument("audio", help="input audio file (wav/mp3)")
    p.add_argument("--op", default="destructo",
                   choices=["destructo", "dimswap", "timereverse", "ewma",
                            "overdrive", "none"])
    p.add_argument("--op-expr", default=None,
                   help="arbitrary python expr over z (reference exec box)")
    p.add_argument("--effect-dry", default=None, help="dry example for fx vector")
    p.add_argument("--effect-wet", default=None, help="wet example for fx vector")
    p.add_argument("--effect-scale", type=float, default=1.0)
    p.add_argument("--steps", type=int, default=35)
    p.add_argument("--chunk-size", type=int, default=65536)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--out", default="destructo_out.wav")
    p.add_argument("--model-config", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--turbo", action="store_true",
                   help="int8 turbo decode (AA_TURBO_INT8=1): ~33%% faster "
                        "diffusion at ~2%% output RMS difference")
    p.add_argument("--num-devices", type=int, default=1,
                   help="shard the chunk batch over this many devices for "
                        "encode+decode (0 = all local devices). The TPU "
                        "replacement for the reference's 8-GPU "
                        "multiprocessing.Pool decode sweep "
                        "(xae_dataset.ipynb cells 66-67)")
    args = p.parse_args()
    if getattr(args, "turbo", False):
        os.environ["AA_TURBO_INT8"] = "1"   # read at model trace time

    import jax.numpy as jnp
    from audio_algebra_tpu.utils.audio_io import load_audio, save_audio, batch_it_crazy
    from audio_algebra_tpu.given_models import DVAEWrapper

    from audio_algebra_tpu.config import load_model_config
    model_kwargs, extra_args = load_model_config(args.model_config)
    args_dict = {"demo_steps": args.steps, "sample_size": args.chunk_size}
    args_dict.update(extra_args)

    w = DVAEWrapper(args_dict=args_dict, model_kwargs=model_kwargs,
                    seed=args.seed)
    w.setup(gdrive=False)

    audio = load_audio(args.audio, sr=48000)
    batch = batch_it_crazy(audio, args.chunk_size, max_batch_size=args.max_batch)
    print(f"chunked: {batch.shape}")

    # multi-device: shard the chunk batch over a data mesh — the jitted
    # encode/decode propagate the sharding SPMD-style (batch-parallel, no
    # collectives), so N chips decode N-fold faster
    import jax
    n_dev = args.num_devices if args.num_devices > 0 else len(jax.devices())
    n_dev = min(n_dev, len(jax.devices()))
    pad = 0
    place = jnp.asarray
    if n_dev > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from audio_algebra_tpu.parallel import make_mesh
        mesh = make_mesh(n_devices=n_dev)
        shard = NamedSharding(mesh, P("data"))
        pad = (-len(batch)) % n_dev
        if pad:
            batch = np.concatenate(
                [batch, np.zeros((pad, *batch.shape[1:]), batch.dtype)])
        place = lambda a: jax.device_put(jnp.asarray(a), shard)
        print(f"sharded over {n_dev} devices (pad {pad})")

    t0 = time.time()
    z = w.encode(place(batch))
    print(f"encoded {tuple(z.shape)} in {time.time()-t0:.1f}s")

    if args.effect_dry and args.effect_wet:
        dry = batch_it_crazy(load_audio(args.effect_dry, sr=48000),
                             args.chunk_size, max_batch_size=args.max_batch)
        wet = batch_it_crazy(load_audio(args.effect_wet, sr=48000),
                             args.chunk_size, max_batch_size=args.max_batch)
        n = min(len(dry), len(wet))
        z_dry = w.encode(jnp.asarray(dry[:n]))
        z_wet = w.encode(jnp.asarray(wet[:n]))
        diff = (z_wet - z_dry).mean(axis=0, keepdims=True)
        z = z + args.effect_scale * diff          # cells 42-54: z + (wet-dry)
        print(f"applied effect vector, |diff|={float(jnp.abs(diff).mean()):.4f}")
    else:
        z = mathemangle(z, args.op, args.op_expr)

    t0 = time.time()
    out = w.decode(z, demo_steps=args.steps)
    out = np.asarray(out)
    dt = time.time() - t0
    if pad:      # drop the zero-chunks added for even sharding
        out = out[..., : (batch.shape[0] - pad) * args.chunk_size]
    audio_sec = (batch.shape[0] - pad) * args.chunk_size / 48000
    print(f"decoded {args.steps} steps in {dt:.1f}s "
          f"({audio_sec/dt:.1f}x realtime)")
    save_audio(args.out, np.clip(out, -1, 1), 48000)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
