#!/usr/bin/env python
"""XAE dataset factory — effected-audio corpus builder.

Script rebuild of the reference's xae_dataset.ipynb (the Hawley & Steinmetz
AES-2023 dataset build): loudness/maxabs-normalise source clips (cell 20),
apply the 10-effect bank + Clean/TimeReverse with per-effect knob sweeps
(cells 27, 33), save a consolidated .npy + manifest (cell 36), then batch-
encode everything through a given model (cell 50) — with the knob sweep
running as ONE vmapped TPU program per (effect, clip-batch) instead of the
reference's per-file pedalboard calls in a multiprocessing pool (cells
66-67; device-sweep parallelism here is the jax mesh).
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--source-dir", required=True, help="input audio tree")
    p.add_argument("--out-dir", default="xae_out")
    p.add_argument("--sample-rate", type=int, default=48000)
    p.add_argument("--chunk-size", type=int, default=262144,
                   help="samples per clip (reference cell 11)")
    p.add_argument("--knob-steps", type=int, default=32)
    p.add_argument("--effects", default="Clean,TimeReverse,Gain,Distortion,"
                   "Reverb,Chorus,Delay,Phaser,Compressor,HighpassFilter,"
                   "LowpassFilter")
    p.add_argument("--normalize", choices=["loudness", "maxabs", "none"],
                   default="loudness")
    p.add_argument("--target-lufs", type=float, default=-23.0)
    p.add_argument("--max-clips", type=int, default=0)
    p.add_argument("--encode", action="store_true",
                   help="also batch-encode with the DVAE (reference cell 50)")
    p.add_argument("--encode-batch", type=int, default=64)
    p.add_argument("--model-config", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from audio_algebra_tpu.datasets import get_audio_filenames
    from audio_algebra_tpu.utils.audio_io import load_audio
    from audio_algebra_tpu.ops.loudness import loudness_normalize, maxabs_normalize
    from audio_algebra_tpu.ops.effects import EFFECTS, knob_sweep, apply_effect

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    files = get_audio_filenames([args.source_dir])
    if args.max_clips:
        files = files[: args.max_clips]
    print(f"{len(files)} source files")

    # 1. load + normalise + chunk
    clips, sources = [], []
    for f in files:
        try:
            audio = load_audio(f, sr=args.sample_rate)
        except Exception as e:
            print(f"skip {f}: {e}")
            continue
        if args.normalize == "loudness":
            audio, _ = loudness_normalize(audio, args.target_lufs, args.sample_rate)
        elif args.normalize == "maxabs":
            audio, _ = maxabs_normalize(audio)
        t = audio.shape[-1]
        n_chunks = max(t // args.chunk_size, 1)
        for c in range(n_chunks):
            seg = np.zeros((2, args.chunk_size), np.float32)
            chunk = audio[:2, c * args.chunk_size : (c + 1) * args.chunk_size]
            if chunk.shape[0] == 1:
                chunk = np.repeat(chunk, 2, axis=0)
            seg[:, : chunk.shape[1]] = chunk
            clips.append(np.clip(seg, -1, 1))
            sources.append(f)
    clips = np.stack(clips) if clips else np.zeros((0, 2, args.chunk_size), np.float32)
    print(f"{len(clips)} clips of {args.chunk_size} samples")

    # 2. effects x knob sweeps as vmapped programs
    effect_names = [e.strip() for e in args.effects.split(",") if e.strip()]
    manifest = []
    store = {}
    for name in effect_names:
        knobs = knob_sweep(name, args.knob_steps) if EFFECTS[name][1] != "none" \
            else np.asarray([0.0])
        print(f"effect {name}: {len(knobs)} knob values")
        outs = []
        static_knob = name in ("PitchShift",)   # shape-changing: loop host-side
        # ONE jitted program per effect, clip as an argument — building the
        # jit inside the clip loop created a fresh function object per clip
        # and recompiled the identical knob-sweep program every time
        sweep_fn = jax.jit(jax.vmap(
            lambda k, xx: apply_effect(name, xx, k, args.sample_rate),
            in_axes=(0, None)))
        for clip_idx in range(len(clips)):
            x = jnp.asarray(clips[clip_idx])
            if static_knob:
                ys = jnp.stack([apply_effect(name, x, float(k), args.sample_rate)
                                for k in knobs])
            else:
                ys = sweep_fn(jnp.asarray(knobs, jnp.float32), x)
            outs.append(np.asarray(ys, np.float32))
            for ki, k in enumerate(knobs):
                manifest.append({"effect": name, "knob_name": EFFECTS[name][1],
                                 "knob": float(k), "clip": clip_idx,
                                 "source": sources[clip_idx],
                                 "row": len(manifest)})
        if outs:
            store[name] = np.stack(outs)     # (clips, knobs, 2, T)

    # 3. consolidated save (reference cell 36)
    np.save(out / "clips.npy", clips)
    for name, arr in store.items():
        np.save(out / f"fx_{name}.npy", arr)
    with open(out / "manifest.json", "w") as f:
        json.dump({"sample_rate": args.sample_rate, "chunk_size": args.chunk_size,
                   "effects": effect_names, "rows": manifest}, f)
    print(f"wrote {out}/clips.npy + {len(store)} effect arrays + manifest")

    # 4. optional batch encode, sharded over every local device
    # (reference cell 50's encode; cells 66-67 farmed the per-effect work
    # over 8 GPUs with torch.multiprocessing.Pool — here the batch axis is
    # sharded over a jax Mesh and XLA splits the work, no processes)
    if args.encode and len(clips):
        from audio_algebra_tpu.given_models import DVAEWrapper
        from audio_algebra_tpu.config import load_model_config
        from audio_algebra_tpu.parallel import make_mesh
        from jax.sharding import NamedSharding, PartitionSpec as P

        model_kwargs, extra_args = load_model_config(args.model_config)
        w = DVAEWrapper(args_dict={'sample_size': args.chunk_size, **extra_args},
                        model_kwargs=model_kwargs)
        w.setup(gdrive=False)
        import jax
        n_dev = len(jax.devices())
        mesh = make_mesh(n_devices=n_dev)
        shard = NamedSharding(mesh, P("data"))
        if n_dev > 1:
            print(f"encode sweep sharded over {n_dev} devices")

        def place(batch):
            # pad to a device multiple so the batch axis shards evenly
            n0 = len(batch)
            pad = (-n0) % n_dev
            if pad:
                reps = (n0 + pad + n0 - 1) // n0
                batch = np.concatenate([batch] * reps, axis=0)[: n0 + pad]
            arr = jnp.asarray(batch)
            return (arr if n_dev == 1 else jax.device_put(arr, shard)), pad

        embs = {}
        for name, arr in store.items():
            flat = arr.reshape(-1, 2, args.chunk_size)
            chunks = []
            for i in range(0, len(flat), args.encode_batch):
                placed, pad = place(flat[i:i + args.encode_batch])
                enc = np.asarray(w.encode(placed))
                chunks.append(enc[: len(enc) - pad] if pad else enc)
            embs[name] = np.concatenate(chunks).reshape(arr.shape[0], arr.shape[1],
                                                        *chunks[0].shape[1:])
            np.save(out / f"emb_{name}.npy", embs[name])
        print(f"encoded {len(embs)} effect banks")


if __name__ == "__main__":
    main()
