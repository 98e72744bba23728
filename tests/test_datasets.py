"""Tests for the data layer (temp WAV corpus on disk)."""
import numpy as np
import pytest

from audio_algebra_tpu.datasets import (
    get_audio_filenames, is_silence, PadCrop, Stereo, PhaseFlipper,
    AudioDataset, DualEffectsDataset, DataLoader,
    Gain, BandPassFilter, BandStopFilter, HighPassFilter, LowPassFilter,
)
from audio_algebra_tpu.utils.audio_io import write_wav


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("audio")
    rng = np.random.default_rng(0)
    sr = 48000
    for i in range(4):
        t = np.arange(sr) / sr
        x = 0.4 * np.sin(2 * np.pi * (220 * (i + 1)) * t) \
            + 0.05 * rng.standard_normal(sr)
        write_wav(str(d / f"tone{i}.wav"), np.stack([x, x]).astype(np.float32), sr)
    (d / "sub").mkdir()
    write_wav(str(d / "sub" / "extra.wav"),
              rng.standard_normal((1, sr // 2)).astype(np.float32) * 0.3, sr)
    return str(d)


def test_get_audio_filenames_recursive(corpus):
    files = get_audio_filenames(corpus)
    assert len(files) == 5
    assert any("sub" in f for f in files)


def test_is_silence():
    assert is_silence(np.zeros(100))
    assert not is_silence(np.ones(100) * 0.5)
    assert is_silence(np.ones(100) * 1e-5, thresh=-60)


def test_padcrop_and_augs():
    x = np.random.default_rng(1).standard_normal((2, 10000)).astype(np.float32)
    out = PadCrop(4096)(x)
    assert out.shape == (2, 4096)
    short = PadCrop(4096, randomize=False)(x[:, :1000])
    assert short.shape == (2, 4096) and abs(short[:, 1000:]).sum() == 0
    assert Stereo()(x[:1]).shape == (2, 10000)
    assert Stereo()(np.zeros(100)).shape == (2, 100)
    flipped = PhaseFlipper(p=1.0)(x)
    np.testing.assert_array_equal(flipped, -x)


def test_audio_dataset(corpus):
    ds = AudioDataset([corpus], sample_size=8192)
    assert len(ds) == 5
    chunk = ds[0]
    assert chunk.shape == (2, 8192)
    assert np.abs(chunk).max() <= 1.0
    assert not is_silence(chunk)


def test_audio_dataset_load_frac(corpus):
    ds = AudioDataset([corpus], sample_size=4096, load_frac=0.5)
    assert len(ds) == 2


def test_effects_have_audible_impact():
    sr = 48000
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 8192)).astype(np.float32) * 0.3
    for eff_cls in (BandPassFilter, BandStopFilter, HighPassFilter, LowPassFilter):
        eff = eff_cls(p=1.0)
        y = eff(x, sample_rate=sr)
        assert y.shape == x.shape
        assert np.isfinite(y).all()
        assert not np.allclose(y, x), eff_cls.__name__
    g = Gain(p=1.0)(x, sample_rate=sr)
    ratio = np.abs(g).max() / np.abs(x).max()
    assert 10 ** (-12.1 / 20) <= ratio <= 10 ** (12.1 / 20)


def test_effect_probability_zero_is_identity():
    x = np.ones((2, 100), np.float32)
    y = LowPassFilter(p=0.0)(x, sample_rate=48000)
    np.testing.assert_array_equal(y, x)


def test_dual_effects_dataset(corpus):
    ds = DualEffectsDataset([corpus], sample_size=8192)
    item = ds[0]
    assert set(item) == {"a", "b", "a1", "b1", "a2", "b2", "e1", "e2"}
    assert item["e1"] != item["e2"]
    for k in ("a", "b", "a1", "b1", "a2", "b2"):
        assert item[k].shape == (2, 8192), k
    # effected versions differ from originals
    assert not np.allclose(item["a1"], item["a"]) or item["e1"] == "Gain"


def test_dataloader_batching(corpus):
    ds = AudioDataset([corpus], sample_size=4096)
    dl = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True)
    batches = list(dl)
    assert len(batches) == len(dl) == 2
    assert batches[0].shape == (2, 2, 4096)


def test_dataloader_dict_collate_and_prefetch(corpus):
    ds = DualEffectsDataset([corpus], sample_size=4096)
    dl = DataLoader(ds, batch_size=2, num_workers=2)
    batch = next(iter(dl))
    assert batch["a1"].shape == (2, 2, 4096)
    assert isinstance(batch["e1"], list) and len(batch["e1"]) == 2


def test_dataloader_multiworker_matches_serial(corpus):
    # N prefetch threads must yield the same batches in the same order as
    # the serial path (num_workers was cosmetic before — one thread only)
    # deterministic items (no random crop / phase flip) so any mismatch is
    # the loader's fault, not per-item aug randomness
    ds = AudioDataset([corpus], sample_size=4096, random_crop=False,
                      augs='Stereo()')
    serial = list(DataLoader(ds, batch_size=2, shuffle=True, seed=7))
    for nw in (1, 3, 8):
        threaded = list(DataLoader(ds, batch_size=2, shuffle=True, seed=7,
                                   num_workers=nw))
        assert len(threaded) == len(serial)
        for a, b in zip(serial, threaded):
            np.testing.assert_array_equal(a, b)
