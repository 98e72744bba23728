#!/usr/bin/env python
"""Effects explorer — corpus study of effect geometry in embedding space.

Script rebuild of the reference's effects_explorer.ipynb (197 cells): apply
an effect bank with knob sweeps to a corpus (cells 19-26), batch-encode
everything (cell 36), compute time-mean PCA projections of the embedding
clouds (cells 50-52), and FX2FX — the mean embedding displacement between
two effects applied to new audio then decoded (cells 146-169). The UMAP
views are optional (umap-learn absent here -> PCA fallback, documented).

Outputs: npz of embeddings + PCA clouds + effect-direction vectors + an
optional FX2FX-transformed decode.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def effect_directions(embs: dict) -> dict:
    """Mean time-averaged embedding per effect + pairwise displacement
    vectors (the FX2FX core, reference cells 146-157)."""
    # e: (clips, knobs, d, n) -> mean over clips, knobs, time -> (d,)
    means = {name: np.asarray(e).mean(axis=(0, 1, -1)) for name, e in embs.items()}
    dirs = {}
    for a in means:
        for b in means:
            if a != b:
                dirs[f"{a}->{b}"] = means[b] - means[a]
    return {"means": means, "dirs": dirs}


def fx2fx(z, direction: np.ndarray, scale: float = 1.0):
    """Apply an effect-direction displacement to embeddings (b, d, n)."""
    return z + scale * direction[None, :, None]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--source-dir", required=True)
    p.add_argument("--out-dir", default="fx_explorer_out")
    p.add_argument("--effects", default="Clean,Gain,Distortion,Reverb,"
                   "LowpassFilter,HighpassFilter")
    p.add_argument("--knob-steps", type=int, default=8)
    p.add_argument("--chunk-size", type=int, default=65536)
    p.add_argument("--max-clips", type=int, default=8)
    p.add_argument("--sample-rate", type=int, default=48000)
    p.add_argument("--model-config", default=None)
    p.add_argument("--fx2fx", default="", help="'EffectA,EffectB' to decode a "
                   "transformed example (reference cells 146-169)")
    p.add_argument("--fx2fx-steps", type=int, default=35)
    p.add_argument("--umap", action="store_true",
                   help="parametric-UMAP 2-D maps, aligned across knob "
                        "sweeps (reference effects_explorer.ipynb cells "
                        "57-134; umap_param.py)")
    p.add_argument("--umap-steps", type=int, default=1500)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from audio_algebra_tpu.datasets import get_audio_filenames, PadCrop, Stereo
    from audio_algebra_tpu.utils.audio_io import load_audio, save_audio
    from audio_algebra_tpu.utils.viz import pca_point_cloud
    from audio_algebra_tpu.ops.effects import EFFECTS, knob_sweep, apply_effect
    from audio_algebra_tpu.given_models import DVAEWrapper

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)

    files = get_audio_filenames([args.source_dir])[: args.max_clips]
    crop, stereo = PadCrop(args.chunk_size, randomize=False), Stereo()
    clips = np.stack([crop(stereo(load_audio(f, sr=args.sample_rate)))
                      for f in files])
    print(f"{len(clips)} clips")

    from audio_algebra_tpu.config import load_model_config
    model_kwargs, extra_args = load_model_config(args.model_config)
    w = DVAEWrapper(args_dict={'sample_size': args.chunk_size, **extra_args},
                    model_kwargs=model_kwargs)
    w.setup(gdrive=False)

    effect_names = [e.strip() for e in args.effects.split(",") if e.strip()]
    embs = {}
    for name in effect_names:
        knobs = knob_sweep(name, args.knob_steps) if EFFECTS[name][1] != "none" \
            else np.asarray([0.0])
        rows = []
        for clip in clips:
            x = jnp.asarray(clip)
            ys = jnp.stack([apply_effect(name, x, float(kv), args.sample_rate)
                            for kv in knobs])
            z = w.encode(ys)                      # (knobs, d, n)
            rows.append(np.asarray(z))
        embs[name] = np.stack(rows)               # (clips, knobs, d, n)
        print(f"encoded {name}: {embs[name].shape}")

    geo = effect_directions(embs)
    all_pts = np.concatenate([e.reshape(-1, *e.shape[2:]) for e in embs.values()])
    cloud = pca_point_cloud(all_pts)
    labels = sum(([n] * (e.shape[0] * e.shape[1]) for n, e in embs.items()), [])

    np.savez(out / "embeddings.npz", **{k: v for k, v in embs.items()})
    np.save(out / "pca_cloud.npy", cloud)
    np.savez(out / "effect_means.npz", **geo["means"])
    np.savez(out / "effect_dirs.npz", **geo["dirs"])
    with open(out / "labels.json", "w") as f:
        json.dump(labels, f)
    print(f"wrote embeddings + PCA cloud + {len(geo['dirs'])} effect directions")

    if args.umap:
        # one shared parametric map over every (clip x knob) time-mean
        # embedding -> aligned 2-D maps per effect sweep (the AlignedUMAP
        # study, reference cells 57-134)
        from audio_algebra_tpu.umap_param import aligned_sweep_maps
        sweeps = {name: e.mean(axis=-1).reshape(-1, e.shape[2])
                  for name, e in embs.items()}      # (clips*knobs, d)
        maps, _pu = aligned_sweep_maps(sweeps, steps=args.umap_steps)
        np.savez(out / "umap_maps.npz", **maps)
        print(f"wrote aligned parametric-UMAP maps for {len(maps)} sweeps")

    if args.fx2fx:
        a, b = [s.strip() for s in args.fx2fx.split(",")]
        direction = geo["dirs"][f"{a}->{b}"]
        z = w.encode(jnp.asarray(clips[:1]))
        z2 = jnp.asarray(fx2fx(np.asarray(z), direction))
        audio_out = w.decode(z2, demo_steps=args.fx2fx_steps)
        save_audio(str(out / f"fx2fx_{a}_to_{b}.wav"),
                   np.clip(np.asarray(audio_out), -1, 1), args.sample_rate)
        print(f"wrote fx2fx_{a}_to_{b}.wav")


if __name__ == "__main__":
    main()
