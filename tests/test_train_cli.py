"""Integration tests for the training CLI surface: run + checkpoint + resume."""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from audio_algebra_tpu.config import write_defaults_ini
from audio_algebra_tpu.utils.audio_io import write_wav

REPO = Path(__file__).resolve().parents[1]

pytestmark = pytest.mark.slow  # subprocess e2e: run with `pytest tests/` (full tier)


@pytest.fixture(scope="module")
def train_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("traincli")
    corpus = root / "corpus"
    corpus.mkdir()
    rng = np.random.default_rng(0)
    sr = 48000
    for i in range(4):
        t = np.arange(sr // 2) / sr
        x = 0.4 * np.sin(2 * np.pi * (200 + 100 * i) * t) \
            + 0.05 * rng.standard_normal(sr // 2)
        write_wav(str(corpus / f"c{i}.wav"), np.stack([x, x]).astype(np.float32), sr)
    mc = root / "tiny.json"
    json.dump({"capacity": 4, "c_mults": [2, 4], "strides": [4, 2],
               "n_attn_layers": 0, "diffusion_c_mults": [8, 16]}, open(mc, "w"))
    ini = root / "t.ini"
    write_defaults_ini(str(ini), overrides=dict(
        training_dir=str(corpus), batch_size=2, num_gpus=1, num_workers=0,
        sample_size=2048, latent_dim=8, load_frac=1.0, demo_every=0,
        checkpoint_every=0, model_config=str(mc), dvae_ckpt_file="/nonexistent",
        max_epochs=2, hidden_dims=8))
    return root, ini


def _run(script, ini, cwd, extra=()):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=str(REPO))
    return subprocess.run(
        [sys.executable, str(REPO / script), "--config-file", str(ini), *extra],
        capture_output=True, text=True, timeout=900, cwd=str(cwd), env=env)


def test_train_mixer_cli_and_resume(train_env):
    root, ini = train_env
    r = _run("train_aa_mixer.py", ini, root)
    assert r.returncode == 0, r.stderr[-800:]
    assert "training done." in r.stdout
    # checkpoint written
    runs = list((root / "runs").rglob("step_*"))
    assert runs, "no checkpoint saved"
    # resume from the run's ckpt dir
    ckpt_dir = sorted(runs)[-1].parent
    r2 = _run("train_aa_mixer.py", ini, root, extra=["--ckpt_path", str(ckpt_dir)])
    assert r2.returncode == 0, r2.stderr[-800:]
    assert "Resumed from" in r2.stdout, r2.stdout[-800:]


def test_train_mixer_accel_cli_and_resume(train_env, tmp_path):
    """The manual-collectives trainer (reference train_aa_mixer_accel.py's
    Accelerate loop, rebuilt on shard_map + explicit pmean) must run,
    checkpoint, and resume just like the annotated-step trainer."""
    root, ini = train_env
    r = _run("train_aa_mixer_accel.py", ini, tmp_path)
    assert r.returncode == 0, r.stderr[-1200:]
    assert "training done." in r.stdout
    runs = list((tmp_path / "runs").rglob("step_*"))
    assert runs, "no checkpoint saved"
    ckpt_dir = sorted(runs)[-1].parent
    r2 = _run("train_aa_mixer_accel.py", ini, tmp_path,
              extra=["--ckpt_path", str(ckpt_dir)])
    assert r2.returncode == 0, r2.stderr[-1200:]
    assert "Resumed from" in r2.stdout, r2.stdout[-800:]
    logs = list((tmp_path / "runs").rglob("log.jsonl"))
    assert logs and any("train_loss" in json.loads(l) for l in open(logs[0]))


def test_train_clapdae_cli_and_resume(train_env, tmp_path):
    """The MIRAGE generator training path (reference
    StackedAELatentDiffusionCond.py:319-394): v-objective + CFG dropout +
    Sobol t + EMA, from-scratch tiny config, with checkpoint + resume."""
    root, _ = train_env
    mc = tmp_path / "clapdae_tiny.json"
    json.dump({
        "first_stage_config": {"capacity": 4, "c_mults": [2, 4],
                               "strides": [4, 4], "latent_dim": 8},
        "model_kwargs": {
            "latent_channels": 8, "latent_multipliers": [1, 2, 4],
            "latent_num_blocks": [1, 1], "factors": [2, 2],
            "diffusion_c_mults": [8, 8], "diffusion_depth": 2,
            "second_stage_latent_dim": 8,
            "channels": 8, "multipliers": [1, 2, 2], "factors2": [1, 2],
            "num_blocks": [1, 1], "attentions": [0, 0, 1]},
        "clap_kwargs": {
            "audio_cfg": {"spec_size": 32, "num_mel_bins": 8,
                          "patch_embed_hidden": 16, "depths": [1, 1],
                          "heads": [2, 2], "window": 4, "n_fft": 256,
                          "hop": 64, "clip_samples": 4096},
            "text_cfg": {"vocab": 300, "hidden": 32, "layers": 1,
                         "heads": 2, "intermediate": 64, "max_pos": 80,
                         "max_len": 16}},
    }, open(mc, "w"))
    ini = tmp_path / "clapdae.ini"
    write_defaults_ini(str(ini), overrides=dict(
        training_dir=str(root / "corpus"), batch_size=2, num_gpus=1,
        num_workers=0, sample_size=2048, load_frac=1.0, demo_every=0,
        checkpoint_every=0, model_config=str(mc), max_epochs=2,
        name="clapdae-test"))
    r = _run("train_clapdae.py", ini, tmp_path)
    assert r.returncode == 0, r.stderr[-1500:]
    assert "training done." in r.stdout
    runs = list((tmp_path / "runs").rglob("step_*"))
    assert runs, "no checkpoint saved"
    ckpt_dir = sorted(runs)[-1].parent
    r2 = _run("train_clapdae.py", ini, tmp_path,
              extra=["--ckpt_path", str(ckpt_dir)])
    assert r2.returncode == 0, r2.stderr[-1500:]
    assert "Resumed from" in r2.stdout, r2.stdout[-800:]
    # loss was logged
    logs = list((tmp_path / "runs").rglob("log.jsonl"))
    assert logs and any("train_loss" in json.loads(l) for l in open(logs[0]))


def test_train_effects_cli(train_env):
    root, ini = train_env
    r = _run("train_aa_effects.py", ini, root)
    assert r.returncode == 0, r.stderr[-800:]
    logs = list((root / "runs" / "aa-effects").rglob("log.jsonl"))
    assert logs
    lines = [json.loads(l) for l in open(logs[0])]
    assert any("train_loss" in l for l in lines)


def test_train_effects_demo_media(train_env, tmp_path):
    """Demo media parity (reference DemoCallback train_aa_effects.py:
    123-188): decoded audio, token spectrograms, embeddings stats and the
    PCA cloud must actually be produced every demo_every steps."""
    root, ini = train_env
    ini2 = tmp_path / "demo.ini"
    base = open(ini).read()
    open(ini2, "w").write(base.replace("demo_every = 0", "demo_every = 2")
                              .replace("demo_steps = 250", "demo_steps = 2")
                              .replace("max_epochs = 2", "max_epochs = 3"))
    r = _run("train_aa_effects.py", ini2, tmp_path)
    assert r.returncode == 0, r.stderr[-1200:]
    assert "demo_log error" not in r.stdout, r.stdout[-1200:]
    run_dirs = list((tmp_path / "runs" / "aa-effects").glob("*"))
    assert run_dirs
    d = run_dirs[0]
    assert list(d.glob("demo_za2_guess_*.wav")), "no decoded algebra audio"
    assert list(d.glob("demo_za2_*.wav"))
    assert list(d.glob("tokens_za1_*.png")) or list(d.glob("tokens_za1_*.npy"))
    assert list(d.glob("*pca_cloud_*.npy"))


def test_train_mixer_demo_media(train_env, tmp_path):
    """Mixer demo: decoded zsum/zmix audio (reference aa_demo,
    aa_mixer.py:330-341)."""
    root, ini = train_env
    ini2 = tmp_path / "mdemo.ini"
    base = open(ini).read()
    open(ini2, "w").write(base.replace("demo_every = 0", "demo_every = 2")
                              .replace("demo_steps = 250", "demo_steps = 2")
                              .replace("max_epochs = 2", "max_epochs = 3"))
    r = _run("train_aa_mixer.py", ini2, tmp_path)
    assert r.returncode == 0, r.stderr[-1200:]
    assert "demo error" not in r.stdout, r.stdout[-1200:]
    run_dirs = list((tmp_path / "runs" / "aa-mixer-vicreg").glob("*"))
    assert run_dirs
    d = run_dirs[0]
    assert list(d.glob("zsum_*.wav")), "no decoded zsum audio"
    assert list(d.glob("zmix_*.wav"))


def test_train_clapdae_cli_fsdp(train_env, tmp_path):
    """--fsdp 1 shards params/EMA/Adam state over the data mesh (ZeRO-3,
    parallel/fsdp.py) — the multi-chip answer to the measured single-chip
    batch cap. Runs the real CLI on the 8-virtual-device mesh."""
    root, _ = train_env
    mc = tmp_path / "clapdae_tiny.json"
    json.dump({
        "first_stage_config": {"capacity": 4, "c_mults": [2, 4],
                               "strides": [4, 4], "latent_dim": 8},
        "model_kwargs": {
            "latent_channels": 8, "latent_multipliers": [1, 2, 4],
            "latent_num_blocks": [1, 1], "factors": [2, 2],
            "diffusion_c_mults": [8, 8], "diffusion_depth": 2,
            "second_stage_latent_dim": 8,
            "channels": 8, "multipliers": [1, 2, 2], "factors2": [1, 2],
            "num_blocks": [1, 1], "attentions": [0, 0, 1]},
        "clap_kwargs": {
            "audio_cfg": {"spec_size": 32, "num_mel_bins": 8,
                          "patch_embed_hidden": 16, "depths": [1, 1],
                          "heads": [2, 2], "window": 4, "n_fft": 256,
                          "hop": 64, "clip_samples": 4096},
            "text_cfg": {"vocab": 300, "hidden": 32, "layers": 1,
                         "heads": 2, "intermediate": 64, "max_pos": 80,
                         "max_len": 16}},
    }, open(mc, "w"))
    # own 8-clip corpus: batch 8 must shard over the 8-device mesh (the
    # module corpus has 4 clips -> every batch would be a dropped ragged
    # tail)
    corpus = tmp_path / "corpus8"
    corpus.mkdir()
    rng = np.random.default_rng(5)
    sr = 48000
    for i in range(8):
        t = np.arange(sr // 2) / sr
        x = 0.4 * np.sin(2 * np.pi * (150 + 80 * i) * t) \
            + 0.05 * rng.standard_normal(sr // 2)
        write_wav(str(corpus / f"f{i}.wav"),
                  np.stack([x, x]).astype(np.float32), sr)
    ini = tmp_path / "clapdae_fsdp.ini"
    write_defaults_ini(str(ini), overrides=dict(
        training_dir=str(corpus), batch_size=8, num_gpus=8,
        num_workers=0, sample_size=2048, load_frac=1.0, demo_every=0,
        checkpoint_every=0, model_config=str(mc), max_epochs=1,
        name="clapdae-fsdp-test"))
    r = _run("train_clapdae.py", ini, tmp_path, extra=["--fsdp", "1"])
    assert r.returncode == 0, r.stderr[-1500:]
    assert "fsdp: train state sharded over data=8" in r.stdout, \
        r.stdout[-800:]
    assert "training done." in r.stdout
