#!/usr/bin/env python
"""MIRAGE — Music Information Retrieval-based Autoencoder for Generation via
Entropy. CLI + (optional) Gradio GUI over the CLAPDAE generator.

Rebuild of reference mirage.py (741 LoC): embed audio/text via CLAP,
combine embeddings by slerp interpolation or weighted algebra, optionally
condition on init-audio latents, generate via CFG latent diffusion, stitch
batch variations with crossfades, save wav + a 3-D PCA latent cloud.

The GUI is optional (gradio isn't in this image); the CLI covers the same
process_audio path (reference mirage.py:255-453, CLI :698-710).
"""
from __future__ import annotations

import argparse
import json
import os
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

# ------------------------------------------------- tensor marshalling ---

def unpack_audio_tup(audio_tup, verbose: bool = True):
    """(sr, np int/float array (N,) or (N, C)) -> ((C, N) float32 @model sr,
    restore-info) (reference mirage.py:64-110)."""
    if audio_tup is None:
        return None, None
    sr, audio = audio_tup
    audio = np.asarray(audio)
    in_dtype = audio.dtype
    if np.issubdtype(in_dtype, np.integer):
        # dtype-aware PCM scale: /32768 is only right for int16 (int32 PCM
        # would overflow [-1,1] 65536x; uint8 is offset-binary)
        ii = np.iinfo(in_dtype)
        if ii.min < 0:
            audio = audio.astype(np.float32) / float(-int(ii.min))
        else:
            half = float(ii.max + 1) / 2.0
            audio = (audio.astype(np.float32) - half) / half
    audio = audio.astype(np.float32)
    mono_in = audio.ndim == 1
    if mono_in:
        audio = audio[:, None]
    audio = audio.T                                     # (C, N)
    if audio.shape[0] == 1:
        audio = np.concatenate([audio, audio], axis=0)
    if sr != 48000:
        from audio_algebra_tpu.ops.resample import resample_np
        audio = resample_np(audio, sr, 48000)
    if verbose:
        print(f"unpack_audio_tup: sr={sr} shape={audio.shape}")
    return audio, {"sr": sr, "mono_in": mono_in, "dtype": str(in_dtype)}


def repack_audio_tup(audio, info, verbose: bool = True):
    """(C, N) float32 -> (sr, (N, C) int16) gradio tuple (reference :96-110)."""
    audio = np.clip(np.asarray(audio), -1, 1)
    out = (audio.T * 32767.0).astype(np.int16)
    if info and info.get("mono_in"):
        out = out[:, :1]
    if verbose:
        print(f"repack_audio_tup: shape={out.shape}")
    return (48000, out)


def half_it(x, debug: bool = False, dtype="bfloat16"):
    """Precision toggle (reference mirage.py:113-124) — bf16 on TPU."""
    import jax.numpy as jnp
    if x is None:
        return None
    target = jnp.bfloat16 if dtype == "bfloat16" else jnp.float16
    return jnp.asarray(x).astype(target)


from audio_algebra_tpu.embedding_math import (   # noqa: E402
    _model_cache, get_model_ready, lerp, slerp, interp_embeddings,
    weighted_algebra)


# -------------------------------------------------------- core logic ---

def process_audio(audio_tups: Sequence = (), text_prompts: Sequence[str] = (),
                  weights: Optional[Sequence[float]] = None,
                  interp_scale: float = 0.5, use_algebra: bool = False,
                  cfg_scale: float = 4.0, demo_steps: int = 150,
                  outer_steps: int = 100, init_audio_tup=None,
                  init_strength: float = 0.4, batch_size: int = 1,
                  seed: int = -1, model_choice: str = "22s",
                  output_dir: str = ".", verbose: bool = True,
                  model_kwargs: Optional[dict] = None, save_pca: bool = True,
                  mesh_spec: Optional[str] = None):
    """Embed -> combine -> generate -> crossfade -> save
    (reference mirage.py:255-453)."""
    import jax
    import jax.numpy as jnp
    from audio_algebra_tpu.utils.audio_io import crossfade_flatten, save_audio
    from audio_algebra_tpu.utils.viz import pca_point_cloud

    model = get_model_ready(model_choice, verbose=verbose,
                            **(model_kwargs or {}))

    if seed >= 0:
        from audio_algebra_tpu.utils.prng import host_key
        model._key = host_key(seed)

    # 1. embed every input (reference :363-368)
    embeddings = []
    for tup in audio_tups:
        audio, _ = unpack_audio_tup(tup, verbose=verbose)
        if audio is not None:
            embeddings.append(model.embed(audio))
    for text in text_prompts:
        if text:
            embeddings.append(model.embed(text))
    if not embeddings:
        raise ValueError("no inputs: supply audio and/or text prompts")

    # 2. combine (reference :372-381)
    if len(embeddings) == 1:
        emb = embeddings[0]
    elif use_algebra:
        weights = weights or [1.0] * len(embeddings)
        emb = weighted_algebra(embeddings, weights)
    else:
        emb = interp_embeddings(embeddings[0], embeddings[1], interp_scale)
        for extra in embeddings[2:]:
            emb = interp_embeddings(emb, extra, interp_scale)

    # 3. init audio latents (reference :392-409)
    init_latents = None
    if init_audio_tup is not None:
        init_audio, _ = unpack_audio_tup(init_audio_tup, verbose=verbose)
        need = model.sample_size
        reps = int(np.ceil(need / init_audio.shape[-1]))
        looped = np.tile(init_audio, (1, reps))[:, :need]   # loop-repeat
        init_latents = model.encode_audio_latents(looped[None])

    # 4. generate (reference :414-421). With --mesh seq=N the outer
    # diffusion stage runs SEQUENCE-PARALLEL across chips — the
    # beyond-reference multi-chip latency path (parallel/infer.py)
    if mesh_spec:
        from audio_algebra_tpu.parallel import mesh_from_spec
        mesh = mesh_from_spec(mesh_spec)
        if "seq" not in mesh.axis_names:
            raise ValueError(
                f"--mesh {mesh_spec!r}: serving shards over a 'seq' axis "
                "(e.g. --mesh seq=4)")
        if init_latents is not None:
            raise ValueError(
                "--mesh seq=N does not support --init-audio yet: the "
                "img2img resample path is single-program; drop one flag")
        fakes, fake_latents = model.generate_seqpar(
            emb, mesh, axis="seq", cfg_scales=cfg_scale,
            demo_steps=demo_steps, outer_steps=outer_steps,
            batch_size=batch_size, flatten=False)
    else:
        fakes, fake_latents = model.generate(
            emb, cfg_scales=cfg_scale, demo_steps=demo_steps,
            outer_steps=outer_steps, init_audio_latents=init_latents,
            init_strength=init_strength, batch_size=batch_size,
            flatten=False)

    # 5. crossfade variations into one take (reference :422-423)
    out = crossfade_flatten(np.asarray(fakes, np.float32))

    # 6. save (reference :434-444)
    os.makedirs(output_dir, exist_ok=True)
    wav_path = str(Path(output_dir) / "mirage_out.wav")
    save_audio(wav_path, out, 48000)
    pca_path = None
    if save_pca:
        from audio_algebra_tpu.utils.viz import point_cloud_html
        cloud = pca_point_cloud(np.asarray(fake_latents), mean_axis=None)
        pca_path = str(Path(output_dir) / "mirage_latents_pca.npy")
        np.save(pca_path, cloud)
        # interactive 3-D cloud (the reference's plotly scatter_3d,
        # reference mirage.py:434-444) — dependency-free HTML
        point_cloud_html(cloud, title="MIRAGE latents (PCA)",
                         path=str(Path(output_dir) / "mirage_latents_pca.html"))
    if verbose:
        print(f"wrote {wav_path}" + (f" and {pca_path}" if pca_path else ""))
    return wav_path, pca_path, out


def load_examples_csv(path: str) -> list:
    """CSV examples loader (reference mirage.py:458-469): rows of
    [audio1, audio2, text1, text2, interp, cfg, steps, seed]-style presets."""
    import csv

    rows = []
    with open(os.path.expanduser(path)) as f:
        for row in csv.reader(f):
            row = [c.strip() for c in row]
            if row and not row[0].startswith("#"):
                rows.append([None if c in ("", "None") else c for c in row])
    return rows


def save_html_hosting_info(share_url: str,
                           info_file: str = "mirage.html",
                           host_url: str = "https://example.org/mirage/") -> str:
    """Write the self-redirecting landing page pointing at the (ephemeral)
    gradio share URL (reference mirage.py:653-685): OpenGraph metadata +
    a 2-second meta refresh, so a stable host URL can front the app."""
    share_url += "?__theme=dark"
    html = (
        "<DOCTYPE html>\n<html>\n  <head>\n  <title>MIRAGE Demo</title>\n"
        '  <meta charset="UTF-8" />\n'
        f'  <meta property="og:url" content="{host_url}">\n'
        f'  <meta property="og:image" content="{host_url}mirage_screenshot.png">\n'
        '  <meta property="og:title" content="Demo of MIRAGE">\n'
        '  <meta property="og:description" content="Music Information '
        'Retrieval-based Audio Generation via Entropy">\n'
        f'  <meta http-equiv="Refresh" content="2; url={share_url}" />\n'
        "  </head>\n  <body>\n  <h1>Redirecting</h1>\n"
        "  Redirecting in 2 seconds.  If you are not automatically "
        f'redirected, click <a href="{share_url}">here</a>.\n'
        "  </body>\n</html>"
    )
    print(f"Saving HTML forwarding info to {info_file}")
    with open(os.path.expanduser(info_file), "w") as f:
        f.write(html)
    return html


# ---------------------------------------------------------------- GUI ---

def run_gui(args):
    """Two-tab Gradio GUI (reference mirage.py:520-634); optional import."""
    try:
        import gradio as gr
    except ImportError:
        print("mirage: gradio is not installed; use the CLI "
              "(mirage.py --text '...' --output-dir out/)")
        return

    def tab1(audio1, audio2, text1, text2, interp, cfg, steps, seed):
        wav, _, _ = process_audio(
            audio_tups=[a for a in (audio1, audio2) if a is not None],
            text_prompts=[t for t in (text1, text2) if t],
            interp_scale=interp, cfg_scale=cfg, demo_steps=int(steps), seed=int(seed))
        return wav

    def tab2(audio1, audio2, text1, text2, w1, w2, w3, w4, cfg, steps, seed):
        wav, _, _ = process_audio(
            audio_tups=[a for a in (audio1, audio2) if a is not None],
            text_prompts=[t for t in (text1, text2) if t],
            weights=[w1, w2, w3, w4], use_algebra=True,
            cfg_scale=cfg, demo_steps=int(steps), seed=int(seed))
        return wav

    with gr.Blocks(title="MIRAGE") as demo:
        with gr.Tab("Interpolation"):
            a1, a2 = gr.Audio(), gr.Audio()
            t1, t2 = gr.Textbox(label="text 1"), gr.Textbox(label="text 2")
            interp = gr.Slider(0, 1, 0.5, label="interp")
            cfg = gr.Slider(0, 15, 4, label="CFG scale")
            steps = gr.Slider(10, 250, 150, label="steps")
            seed = gr.Number(value=-1, label="seed")
            out1 = gr.Audio(label="result")
            gr.Button("Generate").click(tab1, [a1, a2, t1, t2, interp, cfg, steps, seed], out1)
            # preset rows from a CSV next to the app (reference :592)
            if os.path.exists(getattr(args, "examples_csv", "mirage_examples.csv")):
                gr.Examples(
                    examples=load_examples_csv(
                        getattr(args, "examples_csv", "mirage_examples.csv")),
                    inputs=[a1, a2, t1, t2, interp, cfg, steps, seed])
        with gr.Tab("Algebra"):
            b1, b2 = gr.Audio(), gr.Audio()
            s1, s2 = gr.Textbox(label="text 1"), gr.Textbox(label="text 2")
            ws = [gr.Slider(-2, 2, 1.0, label=f"w{i}") for i in range(4)]
            cfg2 = gr.Slider(0, 15, 4, label="CFG scale")
            steps2 = gr.Slider(10, 250, 150, label="steps")
            seed2 = gr.Number(value=-1, label="seed")
            out2 = gr.Audio(label="result")
            gr.Button("Generate").click(tab2, [b1, b2, s1, s2, *ws, cfg2, steps2, seed2], out2)
    auth = None
    if os.environ.get("MIRAGE_USERNAME"):
        auth = (os.environ["MIRAGE_USERNAME"], os.environ.get("MIRAGE_PASSWORD", ""))
    app = demo.launch(share=args.share, auth=auth, prevent_thread_lock=args.share)
    if args.share:
        share_url = getattr(app, "share_url", None) or getattr(demo, "share_url", "")
        if share_url:
            save_html_hosting_info(share_url,
                                   info_file=getattr(args, "html_info_file",
                                                     "mirage.html"))
        demo.block_thread()


# ---------------------------------------------------------------- CLI ---

def main():
    p = argparse.ArgumentParser(description="MIRAGE generator (reference mirage.py:698-710)")
    p.add_argument("--audio", action="append", default=[], help="input audio file(s)")
    p.add_argument("--text", action="append", default=[], help="text prompt(s)")
    p.add_argument("--weights", type=str, default="", help="comma-separated algebra weights")
    p.add_argument("--interp", type=float, default=0.5)
    p.add_argument("--algebra", action="store_true")
    p.add_argument("--cfg-scale", type=float, default=4.0)
    p.add_argument("--steps", type=int, default=150)
    p.add_argument("--outer-steps", type=int, default=100)
    p.add_argument("--init-audio", type=str, default=None)
    p.add_argument("--init-strength", type=float, default=0.4)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--seed", type=int, default=-1)
    p.add_argument("--model", choices=["22s", "66s"], default="22s")
    p.add_argument("--model-config", type=str, default=None,
                   help="JSON of CLAPDAE kwargs (custom model sizes)")
    p.add_argument("--output-dir", type=str, default="mirage_out")
    p.add_argument("--gui", action="store_true")
    p.add_argument("--share", action="store_true")
    p.add_argument("--examples-csv", type=str, default="mirage_examples.csv",
                   help="CSV of GUI preset rows (reference mirage.py:458)")
    p.add_argument("--html-info-file", type=str, default="mirage.html",
                   help="where --share writes the redirect page (reference :653)")
    p.add_argument("--turbo", action="store_true",
                   help="int8 turbo decode (AA_TURBO_INT8=1): +13-16%% realtime "
                        "at serving batches (r5-measured, ~3.4%% rel RMS)")
    p.add_argument("--mesh", type=str, default=None, metavar="seq=N",
                   help="run the outer diffusion stage sequence-parallel "
                        "over N chips (multi-chip latency path); e.g. "
                        "--mesh seq=4. Incompatible with --init-audio.")
    args = p.parse_args()
    if getattr(args, "turbo", False):
        os.environ["AA_TURBO_INT8"] = "1"   # read at model trace time
    # persistent XLA compile cache: repeat invocations (the GUI's always-on
    # process role, reference mirage.py:520-651) skip the cold compile
    from audio_algebra_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()

    if args.gui:
        run_gui(args)
        return

    from audio_algebra_tpu.utils.audio_io import load_audio

    audio_tups = []
    for path in args.audio:
        audio = load_audio(path, sr=48000)
        audio_tups.append((48000, audio.T))
    init_tup = None
    if args.init_audio:
        init_tup = (48000, load_audio(args.init_audio, sr=48000).T)
    weights = [float(w) for w in args.weights.split(",")] if args.weights else None
    model_kwargs = None
    if args.model_config:
        model_kwargs = json.load(open(args.model_config))

    wav, pca, _ = process_audio(
        audio_tups=audio_tups, text_prompts=args.text, weights=weights,
        interp_scale=args.interp, use_algebra=args.algebra,
        cfg_scale=args.cfg_scale, demo_steps=args.steps,
        outer_steps=args.outer_steps, init_audio_tup=init_tup,
        init_strength=args.init_strength, batch_size=args.batch_size,
        seed=args.seed, model_choice=args.model, output_dir=args.output_dir,
        model_kwargs=model_kwargs, mesh_spec=args.mesh)
    print(json.dumps({"wav": wav, "pca": pca}))


if __name__ == "__main__":
    main()
