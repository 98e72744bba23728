"""FLAC + OGG/Vorbis codec coverage.

The reference reads arbitrary-format corpora through torchaudio's ffmpeg/
libsndfile backends (reference datasets.py:25 via aeiou.load_audio). The
rebuild decodes FLAC with a from-scratch C++ decoder
(native/flac_decoder.cpp) and OGG/Vorbis via the dlopen'd system
libvorbisfile (native/vorbis_codec.cpp). Fixtures are generated offline:
FLAC by the pure-Python writer (utils/flac_write.py), OGG by the
libvorbisenc-backed native encoder — so the decoders are exercised against
real spec-conformant streams with zero network access.
"""
import numpy as np
import pytest

from audio_algebra_tpu.utils import audio_io
from audio_algebra_tpu.utils.flac_write import write_flac

pytestmark = pytest.mark.skipif(
    audio_io._native_lib() is None,
    reason="native codec not built (make -C native)",
)


def _tone(channels=2, n=20000, sr=44100, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    x = np.stack([
        0.5 * np.sin(2 * np.pi * (220 * (c + 1)) * t)
        + 0.05 * rng.standard_normal(n)
        for c in range(channels)
    ]).astype(np.float32)
    return np.clip(x, -1, 1)


def _roundtrip_flac(tmp_path, x, sr=44100, **kw):
    p = str(tmp_path / "t.flac")
    write_flac(p, x, sr, **kw)
    y, got_sr = audio_io.decode_flac(p)
    assert got_sr == sr
    assert y.shape == x.shape
    # 16-bit quantisation error bound: half an LSB plus rounding slack
    assert np.max(np.abs(y - x)) < 2.0 / 32768.0
    return y


def test_flac_roundtrip_stereo_independent(tmp_path):
    _roundtrip_flac(tmp_path, _tone(2))


def test_flac_roundtrip_mono(tmp_path):
    _roundtrip_flac(tmp_path, _tone(1))


def test_flac_left_side(tmp_path):
    _roundtrip_flac(tmp_path, _tone(2), stereo_mode="left_side")


def test_flac_mid_side(tmp_path):
    _roundtrip_flac(tmp_path, _tone(2), stereo_mode="mid_side")


def test_flac_rice_partitions(tmp_path):
    _roundtrip_flac(tmp_path, _tone(2), partition_order=3)


def test_flac_constant_subframe(tmp_path):
    # silence -> CONSTANT subframes; odd length -> short final block
    x = np.zeros((2, 4096 + 123), dtype=np.float32)
    _roundtrip_flac(tmp_path, x)


def test_flac_small_blocksize_many_frames(tmp_path):
    # >128 frames exercises the multi-byte UTF-8 frame numbers
    _roundtrip_flac(tmp_path, _tone(1, n=40000), block_size=256)


def test_flac_verbatim_subframes(tmp_path):
    _roundtrip_flac(tmp_path, _tone(2), subframe_mode="verbatim")


def test_flac_lpc_subframes(tmp_path):
    # order-2 LPC with quantised coefs + shift: the real-libFLAC hot path
    _roundtrip_flac(tmp_path, _tone(2, n=30000), subframe_mode="lpc",
                    partition_order=2)


def test_flac_rejects_garbage(tmp_path):
    p = tmp_path / "bad.flac"
    p.write_bytes(b"fLaC" + b"\x00" * 16)
    with pytest.raises(ValueError):
        audio_io.decode_flac(str(p))


def test_ogg_roundtrip(tmp_path):
    x = _tone(2, n=44100)
    p = str(tmp_path / "t.ogg")
    audio_io.encode_ogg(p, x, 44100, quality=0.6)
    y, sr = audio_io.decode_ogg(p)
    assert sr == 44100
    assert y.shape[0] == 2
    # lossy codec: lengths match within one vorbis block, content correlates
    assert abs(y.shape[1] - x.shape[1]) < 2048
    n = min(y.shape[1], x.shape[1])
    a, b = x[0, :n], y[0, :n]
    corr = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert corr > 0.9, f"decoded audio decorrelated (corr={corr:.3f})"


def test_load_audio_dispatch_and_resample(tmp_path):
    x = _tone(2, n=22050)
    fp = str(tmp_path / "t.flac")
    write_flac(fp, x, 44100)
    out = audio_io.load_audio(fp, sr=48000)
    assert out.shape[0] == 2
    assert abs(out.shape[1] - int(22050 * 48000 / 44100)) <= 2

    op = str(tmp_path / "t.ogg")
    audio_io.encode_ogg(op, x, 44100)
    out = audio_io.load_audio(op, sr=48000)
    assert out.shape[0] == 2


def test_decode_batch_dispatches_by_magic(tmp_path):
    """aa_decode_batch sniffs magic, so wrong/absent extensions still work."""
    x = _tone(2, n=8192)
    fp = tmp_path / "a.flac"
    op = tmp_path / "b.ogg"
    wp = tmp_path / "c.wav"
    write_flac(str(fp), x, 44100)
    audio_io.encode_ogg(str(op), x, 44100)
    audio_io.write_wav(str(wp), x, 44100)
    res = audio_io.decode_batch([str(fp), str(op), str(wp)])
    assert all(r is not None for r in res)
    for (arr, sr) in res:
        assert sr == 44100 and arr.shape[0] == 2
    # FLAC and WAV are lossless up to 16-bit quantisation
    assert np.max(np.abs(res[0][0] - x)) < 2.0 / 32768.0
    assert np.max(np.abs(res[2][0] - x)) < 2.0 / 32768.0


def test_save_audio_extension_dispatch(tmp_path):
    x = _tone(2, n=9000)
    for ext in ("wav", "flac", "ogg"):
        p = str(tmp_path / f"out.{ext}")
        audio_io.save_audio(p, x, 48000)
        y, sr = audio_io.load_audio_raw(p)
        assert sr == 48000 and y.shape[0] == 2


def test_dataset_accepts_flac(tmp_path):
    from audio_algebra_tpu.datasets import AudioDataset
    for i in range(3):
        write_flac(str(tmp_path / f"s{i}.flac"), _tone(2, n=9000, seed=i), 48000)
    ds = AudioDataset([str(tmp_path)], sample_size=4096, augs="")
    assert len(ds) == 3
    item = ds[0]
    assert item.shape == (2, 4096)
