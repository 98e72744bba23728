"""Config layer + audio IO tests."""
import numpy as np
import pytest

from audio_algebra_tpu.config import get_all_args, write_defaults_ini, DEFAULTS
from audio_algebra_tpu.utils.audio_io import (
    read_wav, write_wav, save_audio, batch_it_crazy, crossfade_flatten,
)


def test_config_ini_roundtrip(tmp_path):
    ini = tmp_path / "defaults.ini"
    write_defaults_ini(str(ini))
    args = get_all_args(str(ini), argv=[])
    assert args.batch_size == 1024
    assert args.sample_rate == 48000
    assert args.latent_dim == 64
    assert args.start_method == "spawn"
    assert args.load_frac == 0.5


def test_config_cli_overrides(tmp_path):
    ini = tmp_path / "defaults.ini"
    write_defaults_ini(str(ini))
    args = get_all_args(str(ini), argv=["--batch_size", "8", "--name", "test-run"])
    assert args.batch_size == 8
    assert args.name == "test-run"


def test_config_file_switch(tmp_path):
    a, b = tmp_path / "a.ini", tmp_path / "b.ini"
    write_defaults_ini(str(a))
    write_defaults_ini(str(b), overrides={"num_gpus": 1, "load_frac": 1.0})
    args = get_all_args(str(a), argv=["--config-file", str(b)])
    assert args.num_gpus == 1 and args.load_frac == 1.0


def test_defaults_schema_matches_reference_keys():
    # the schema keys the reference training scripts consume must exist
    for key in ("sample_size", "demo_steps", "ema_decay", "num_quantizers",
                "pqmf_bands", "checkpoint_every", "accum_batches", "num_workers"):
        assert key in DEFAULTS


@pytest.mark.parametrize("subtype,atol", [("pcm16", 1e-4), ("float32", 1e-7)])
def test_wav_roundtrip(tmp_path, rng, subtype, atol):
    x = np.tanh(rng.standard_normal((2, 4800))).astype(np.float32) * 0.9
    p = tmp_path / "t.wav"
    write_wav(str(p), x, 48000, subtype=subtype)
    y, sr = read_wav(str(p))
    assert sr == 48000 and y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=atol)


def test_save_audio_clamps(tmp_path):
    x = np.array([[2.0, -2.0, 0.5]], dtype=np.float32)
    p = tmp_path / "c.wav"
    save_audio(str(p), x, 48000)
    y, _ = read_wav(str(p))
    assert y.max() <= 1.0 and y.min() >= -1.0


def test_batch_it_crazy_shapes():
    x = np.ones((2, 100000), dtype=np.float32)
    b = batch_it_crazy(x, 65536)
    assert b.shape == (2, 2, 65536)
    # tail zero-padded
    assert b[1, :, 100000 - 65536 :].sum() == 0
    mono = batch_it_crazy(np.ones(1000), 256)
    assert mono.shape == (4, 1, 256)
    capped = batch_it_crazy(x, 4096, max_batch_size=8)
    assert capped.shape[0] == 8


def test_crossfade_flatten():
    b, c, n, sr = 3, 2, 48000, 48000
    fakes = np.ones((b, c, n), dtype=np.float32)
    out = crossfade_flatten(fakes, sr=sr, fade_secs=0.5)
    ov = int(0.5 * sr)
    assert out.shape == (c, b * n - (b - 1) * ov)
    # equal-power sine crossfade of constant-1 signals stays near 1 mid-fade
    mid = out[:, n - ov // 2]
    assert (np.abs(mid - np.sqrt(2) / 2 * 2) < 0.45).all() or (mid <= 1.45).all()
    single = crossfade_flatten(np.ones((1, 2, 100), dtype=np.float32))
    assert single.shape == (2, 100)
