#!/usr/bin/env python
"""Generate tests/goldens/parity.json — measured fidelity numbers on the
examples/ fixtures (see tests/test_golden_parity.py). Run on CPU:

    JAX_PLATFORMS=cpu python tools/make_goldens.py

Publishes: per-wrapper roundtrip spectral MSE on the dry fixtures, the
torch.stft parity error, and the DVAE embedding fingerprint.
"""
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")   # deterministic goldens; the
    # image's sitecustomize initialises jax before env vars can take effect
    import jax.numpy as jnp
    from audio_algebra_tpu.utils import audio_io
    from audio_algebra_tpu.given_models import (
        SpectrogramAE, MagSpectrogramAE, MagDPhaseSpectrogramAE,
        MelSpectrogramAE, DVAEWrapper)
    import sys
    sys.path.insert(0, str(REPO / "tests"))
    from test_golden_parity import spectral_mse, FIXTURES

    golden = {}
    audio = {}
    for name in FIXTURES:
        x, sr = audio_io.decode_mp3(str(REPO / "examples" / f"{name}.mp3"))
        audio[name] = x[:, : 2 ** 17].astype(np.float32)

    for cls in (SpectrogramAE, MagSpectrogramAE, MagDPhaseSpectrogramAE,
                MelSpectrogramAE):
        w = cls()
        for name in FIXTURES:
            reals = audio[name][:, :65536][None]
            rec = np.asarray(w.decode(w.encode(reals)))
            mse = spectral_mse(rec, reals)
            golden[f"{cls.__name__}/{name}"] = mse
            print(f"{cls.__name__:<24s} {name:<24s} spectral MSE {mse:.3e}")

    try:
        import torch
        from audio_algebra_tpu.ops.stft import stft
        x = audio["guitar_dry"][0, :65536]
        ours = np.asarray(stft(jnp.asarray(x), n_fft=1024, hop_length=256))
        theirs = torch.stft(torch.from_numpy(x), n_fft=1024, hop_length=256,
                            window=torch.hann_window(1024), center=True,
                            return_complex=True, pad_mode="reflect").numpy()
        n = min(ours.shape[-1], theirs.shape[-1])
        err = float(np.mean(np.abs(ours[..., :n] - theirs[..., :n]) ** 2)
                    / np.mean(np.abs(theirs[..., :n]) ** 2))
        golden["stft_vs_torch/guitar_dry"] = err
        print(f"stft vs torch.stft: rel MSE {err:.3e}")
    except ImportError:
        pass

    w = DVAEWrapper(args_dict={"sample_size": 16384, "latent_dim": 8},
                    model_kwargs={"capacity": 4, "c_mults": [2, 4],
                                  "strides": [4, 2], "n_attn_layers": 0,
                                  "diffusion_c_mults": [8, 16]}, seed=0)
    emb = np.asarray(w.encode(audio["guitar_dry"][:, :16384][None]))
    golden["DVAE/guitar_dry_emb_stats"] = [
        float(np.mean(emb)), float(np.std(emb)), float(np.abs(emb).max())]

    out = REPO / "tests" / "goldens" / "parity.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(golden, indent=1))
    print(f"wrote {out} ({len(golden)} entries)")


def main_generation():
    """Write tests/goldens/generation.json — the fixed-seed tiny-model
    generate() fingerprint pinned by tests/test_generation_golden.py."""
    import sys

    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, str(REPO / "tests"))
    from test_generation_golden import run_tiny_generation, fingerprint

    fakes, latents = run_tiny_generation()
    fp = fingerprint(fakes, latents)
    out = REPO / "tests" / "goldens" / "generation.json"
    out.write_text(json.dumps(fp, indent=1))
    print(f"wrote {out}: fakes_rms={fp['fakes_rms']:.6f} "
          f"latents_rms={fp['latents_rms']:.6f}")


if __name__ == "__main__":
    if "--generation" in sys.argv:
        main_generation()
    else:
        main()
