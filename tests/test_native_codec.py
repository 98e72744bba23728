"""Native codec tests (requires `make -C native`; skips when unbuilt)."""
import ctypes
from pathlib import Path

import numpy as np
import pytest

from audio_algebra_tpu.utils import audio_io

NATIVE = (Path(__file__).resolve().parents[1] / "native" / "libaacodec.so")
EXAMPLES = Path("/root/reference/examples")

pytestmark = pytest.mark.skipif(not NATIVE.exists(),
                                reason="native codec not built")


def test_decode_mp3_fixture():
    if not (EXAMPLES / "guitar_dry.mp3").exists():
        pytest.skip("reference fixtures unavailable")
    x, sr = audio_io.decode_mp3(str(EXAMPLES / "guitar_dry.mp3"))
    assert sr in (44100, 48000)
    assert x.shape[0] == 2 and x.shape[1] > 100000
    assert np.isfinite(x).all()
    assert 0.01 < np.abs(x).max() <= 1.0
    # real audio, not noise: strong low-frequency energy concentration
    spec = np.abs(np.fft.rfft(x[0, :65536]))
    low, high = spec[:4000].sum(), spec[20000:].sum()
    assert low > 5 * high


def test_native_wav_reader_matches_python(tmp_path):
    lib = ctypes.CDLL(str(NATIVE))
    lib.aa_read_wav.restype = ctypes.c_longlong
    lib.aa_read_wav.argtypes = [ctypes.c_char_p,
                                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                                ctypes.POINTER(ctypes.c_int),
                                ctypes.POINTER(ctypes.c_int)]
    lib.aa_free.argtypes = [ctypes.POINTER(ctypes.c_float)]

    rng = np.random.default_rng(0)
    x = np.tanh(rng.standard_normal((2, 4800))).astype(np.float32) * 0.8
    p = tmp_path / "t.wav"
    audio_io.write_wav(str(p), x, 48000, subtype="float32")

    buf = ctypes.POINTER(ctypes.c_float)()
    ch, sr = ctypes.c_int(0), ctypes.c_int(0)
    n = lib.aa_read_wav(str(p).encode(), ctypes.byref(buf),
                        ctypes.byref(ch), ctypes.byref(sr))
    assert n == 4800 and ch.value == 2 and sr.value == 48000
    arr = np.ctypeslib.as_array(buf, shape=(int(n) * 2,)).reshape(int(n), 2).T.copy()
    lib.aa_free(buf)
    np.testing.assert_allclose(arr, x, atol=1e-6)


def test_load_audio_mp3_resamples():
    if not (EXAMPLES / "piano_dry.mp3").exists():
        pytest.skip("reference fixtures unavailable")
    a = audio_io.load_audio(str(EXAMPLES / "piano_dry.mp3"), sr=48000)
    # 193390 samples @44.1k -> ~210465 @48k
    assert a.shape[0] == 2
    assert abs(a.shape[1] - 193390 * 48000 / 44100) < 10


def test_batch_decode_threadpool(tmp_path):
    """aa_decode_batch: one native call, C++ thread pool, mixed formats,
    per-file failure isolation."""
    from audio_algebra_tpu.utils.audio_io import decode_batch, write_wav

    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        x = (0.3 * np.sin(2 * np.pi * (100 + 50 * i)
                          * np.arange(8000) / 16000)).astype(np.float32)
        p = tmp_path / f"b{i}.wav"
        write_wav(str(p), np.stack([x, x]), 16000)
        paths.append(str(p))
    if (EXAMPLES / "guitar_dry.mp3").exists():
        paths.append(str(EXAMPLES / "guitar_dry.mp3"))
    paths.append(str(tmp_path / "missing.wav"))     # must not poison batch

    out = decode_batch(paths, num_threads=4)
    assert len(out) == len(paths)
    assert out[-1] is None                           # the missing file
    for i in range(6):
        arr, sr = out[i]
        assert sr == 16000 and arr.shape == (2, 8000)
        ref, ref_sr = __import__(
            "audio_algebra_tpu.utils.audio_io", fromlist=["read_wav"]
        ).read_wav(paths[i])
        np.testing.assert_allclose(arr, ref, atol=1e-6)
    if len(out) == 8:                                # mp3 fixture present
        assert out[6] is not None and out[6][0].shape[0] == 2


def test_dataset_precache_uses_batch_decode(tmp_path):
    from audio_algebra_tpu.datasets import AudioDataset
    from audio_algebra_tpu.utils.audio_io import write_wav

    for i in range(3):
        x = 0.3 * np.sin(2 * np.pi * 220 * np.arange(24000) / 48000)
        write_wav(str(tmp_path / f"c{i}.wav"),
                  np.stack([x, x]).astype(np.float32), 48000)
    ds = AudioDataset([str(tmp_path)], sample_size=4096,
                      cache_training_data=True)
    assert len(ds._cache) == 3
    item = ds[0]
    assert item.shape == (2, 4096)
