"""Scientific toy verification + script-level smoke tests."""
import os
import json
import subprocess
import sys
import numpy as np
import pytest

import aa_toy
from audio_algebra_tpu.ops.loudness import (
    integrated_loudness, loudness_normalize, maxabs_normalize)


@pytest.mark.slow
def test_toy_training_restores_algebra():
    """The core scientific claim (reference aa-mixer-toy cell 58): after
    VICReg training, encode-then-sum matches sum-then-encode much better
    through h than through the raw nonlinear encoder."""
    (model, params), history = aa_toy.train_toy(steps=1500, batch=256,
                                                log_every=500, seed=0)
    assert history[-1]["loss"] < history[0]["loss"] * 0.05
    err = aa_toy.algebra_error(model, params)
    # measured: 1.8x at 900 steps, 5.2x at 3000; require >1.5x at 1500
    assert err["z_err"] < err["raw_err"] / 1.5, err
    kmw = aa_toy.kmw_demo(model, params)
    assert np.isfinite(kmw["kmw_err"])


def test_twist_and_scrunch_is_nonlinear():
    import jax.numpy as jnp
    a = jnp.asarray([[0.3, 0.1]])
    b = jnp.asarray([[-0.2, 0.4]])
    lhs = aa_toy.twist_and_scrunch(a) + aa_toy.twist_and_scrunch(b)
    rhs = aa_toy.twist_and_scrunch(a + b)
    assert float(jnp.abs(lhs - rhs).max()) > 0.05


# ------------------------------------------------------------ loudness ---

@pytest.mark.slow
def test_integrated_loudness_sine():
    sr = 48000
    t = np.arange(3 * sr) / sr
    x = (0.25 * np.sin(2 * np.pi * 997 * t)).astype(np.float32)[None]
    lufs = integrated_loudness(x, sr)
    # -0.691 + 10log10(ms_k); K-weighting ~ +0.6dB at 1k; ballpark check
    assert -18 < lufs < -12, lufs
    # scaling by 0.5 drops loudness by ~6 dB
    lufs2 = integrated_loudness(x * 0.5, sr)
    assert abs((lufs - lufs2) - 6.0) < 0.5


@pytest.mark.slow
def test_loudness_normalize():
    sr = 48000
    t = np.arange(2 * sr) / sr
    x = (0.02 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None]
    y, before = loudness_normalize(x, target_lufs=-23.0, sample_rate=sr)
    after = integrated_loudness(y, sr)
    assert abs(after + 23.0) < 0.5, after


def test_maxabs_normalize():
    x = np.array([[0.1, -0.2, 0.05]], np.float32)
    y, peak = maxabs_normalize(x, peak=0.95)
    assert abs(np.abs(y).max() - 0.95) < 1e-6 and abs(peak - 0.2) < 1e-7


# ------------------------------------------------------ script surface ---

@pytest.mark.parametrize("script", ["destructo.py", "mirage.py",
                                    "train_aa_mixer.py", "train_aa_effects.py",
                                    "calc_effects_pca.py", "xae_dataset.py",
                                    "effects_explorer.py", "aa_toy.py",
                                    "bench.py"])
def test_scripts_have_help(script):
    r = subprocess.run([sys.executable, f"/root/repo/{script}", "--help"],
                       capture_output=True, text=True, timeout=120,
                       env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
                            "PYTHONPATH": "/root/repo",
                            "HOME": "/root"})
    assert r.returncode == 0, r.stderr[-500:]
    assert "usage" in r.stdout.lower() or "usage" in r.stderr.lower()


# -------------------------------------------------- script e2e (tiny) ---

@pytest.fixture(scope="module")
def script_corpus(tmp_path_factory):
    import json as _json
    from audio_algebra_tpu.utils.audio_io import write_wav
    root = tmp_path_factory.mktemp("scripts_e2e")
    corpus = root / "corpus"
    corpus.mkdir()
    rng = np.random.default_rng(1)
    sr = 48000
    for i in range(3):
        t = np.arange(sr // 3) / sr
        x = 0.4 * np.sin(2 * np.pi * (220 + 110 * i) * t) \
            + 0.02 * rng.standard_normal(sr // 3)
        write_wav(str(corpus / f"s{i}.wav"), np.stack([x, x]).astype(np.float32), sr)
    mc = root / "tiny_dvae.json"
    _json.dump({"model_kwargs": {"capacity": 4, "c_mults": [2, 4],
                                 "strides": [4, 2], "n_attn_layers": 0,
                                 "diffusion_c_mults": [8, 16]},
                "args_dict": {"latent_dim": 8, "sample_size": 2048}},
               open(mc, "w"))
    return root, corpus, mc


@pytest.mark.slow
def test_xae_dataset_e2e(script_corpus):
    """xae_dataset.py end-to-end on a tiny corpus: effected arrays,
    manifest, and encoded embeddings land on disk (reference
    xae_dataset.ipynb cells 27-50)."""
    import json as _json
    root, corpus, mc = script_corpus
    out = root / "xae_out"
    r = subprocess.run(
        [sys.executable, "/root/repo/xae_dataset.py",
         "--source-dir", str(corpus), "--out-dir", str(out),
         "--chunk-size", "2048", "--knob-steps", "3", "--max-clips", "2",
         "--effects", "Clean,Gain,LowpassFilter", "--encode",
         "--encode-batch", "4", "--model-config", str(mc)],
        capture_output=True, text=True, timeout=600,
        env=dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo",
                 XLA_FLAGS="--xla_force_host_platform_device_count=8"))
    assert r.returncode == 0, r.stderr[-1200:]
    # the encode sweep must actually shard over the virtual mesh
    assert "sharded over 8 devices" in r.stdout, r.stdout[-600:]
    assert (out / "clips.npy").exists()
    man = _json.load(open(out / "manifest.json"))
    assert man["effects"] == ["Clean", "Gain", "LowpassFilter"]
    assert (out / "fx_Gain.npy").exists()
    gain = np.load(out / "fx_Gain.npy")
    assert gain.shape[-1] == 2048
    assert (out / "emb_Gain.npy").exists(), "encode step produced no embeddings"


@pytest.mark.slow
def test_destructo_multidevice_e2e(script_corpus):
    """destructo.py --num-devices 8: the chunk batch shards over the
    virtual mesh for encode AND diffusion decode (the TPU replacement for
    the reference's 8-GPU Pool decode sweep, xae_dataset.ipynb cells
    66-67); output audio must land with the un-padded length."""
    root, corpus, mc = script_corpus
    wav = str(next(corpus.glob("*.wav")))
    out = root / "destructo_mesh.wav"
    r = subprocess.run(
        [sys.executable, "/root/repo/destructo.py", wav,
         "--op", "timereverse", "--steps", "2", "--chunk-size", "2048",
         "--max-batch", "6", "--model-config", str(mc),
         "--num-devices", "8", "--out", str(out)],
        capture_output=True, text=True, timeout=600,
        env=dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo",
                 XLA_FLAGS="--xla_force_host_platform_device_count=8"))
    assert r.returncode == 0, r.stderr[-1200:]
    assert "sharded over 8 devices" in r.stdout, r.stdout[-600:]
    assert out.exists()
    from audio_algebra_tpu.utils.audio_io import load_audio
    got = load_audio(str(out), sr=48000)
    # padded zero-chunks must NOT appear in the output: 6 real chunks
    assert got.shape[-1] == 6 * 2048, got.shape


@pytest.mark.slow
def test_effects_explorer_e2e(script_corpus):
    """effects_explorer.py end-to-end: knob-sweep embeddings, PCA cloud and
    effect geometry files (reference effects_explorer.ipynb cells 19-52)."""
    root, corpus, mc = script_corpus
    out = root / "fx_out"
    r = subprocess.run(
        [sys.executable, "/root/repo/effects_explorer.py",
         "--source-dir", str(corpus), "--out-dir", str(out),
         "--chunk-size", "2048", "--knob-steps", "2", "--max-clips", "2",
         "--effects", "Clean,Gain", "--model-config", str(mc),
         "--umap", "--umap-steps", "60"],
        capture_output=True, text=True, timeout=600,
        env=dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo"))
    assert r.returncode == 0, r.stderr[-1200:]
    embs = np.load(out / "embeddings.npz")
    assert "Gain" in embs.files and "Clean" in embs.files
    assert (out / "pca_cloud.npy").exists()
    dirs = np.load(out / "effect_dirs.npz")
    assert "Clean->Gain" in dirs.files          # FX2FX displacement vector
    maps = np.load(out / "umap_maps.npz")       # aligned parametric-UMAP
    assert set(maps.files) == {"Clean", "Gain"}
    for m in maps.files:
        assert maps[m].shape[-1] == 2 and np.isfinite(maps[m]).all()


def test_build_docs_site(tmp_path):
    """tools/build_docs.py renders the guide + per-module API pages (the
    reference's quarto-site role, _quarto.yml/sidebar.yml)."""
    out = tmp_path / "site"
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/build_docs.py",
         "--out", str(out)],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env=dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo"))
    assert r.returncode == 0, r.stderr[-1500:]
    assert (out / "index.html").exists()
    assert (out / "performance.html").exists()
    api = list((out / "api").glob("*.html"))
    assert len(api) > 30, len(api)
    gm = (out / "api" / "audio_algebra_tpu.given_models.html").read_text()
    assert "CLAPDAE" in gm and "api-item" in gm
    idx = (out / "index.html").read_text()
    assert "<nav>" in idx and "api/audio_algebra_tpu.models.rave.html" in idx
