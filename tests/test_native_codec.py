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
