"""STFT/iSTFT/GriffinLim golden tests against numpy FFT references."""
import numpy as np
import jax.numpy as jnp
import pytest

from audio_algebra_tpu.ops.stft import (
    stft, istft, spectrogram, inverse_spectrogram, griffin_lim, hann_window,
)


def _np_stft(x, n_fft, hop, center=True):
    """Reference STFT built directly on np.fft (torch.stft semantics)."""
    if center:
        pad = n_fft // 2
        x = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    n_frames = 1 + (x.shape[-1] - n_fft) // hop
    frames = np.stack([x[..., i * hop : i * hop + n_fft] * w for i in range(n_frames)], -2)
    return np.moveaxis(np.fft.rfft(frames, axis=-1), -1, -2)


@pytest.mark.parametrize("shape", [(4096,), (2, 4096), (3, 2, 8192)])
def test_stft_matches_numpy(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    ours = np.asarray(stft(jnp.asarray(x), n_fft=1024, hop_length=256))
    ref = _np_stft(x, 1024, 256)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)


def test_stft_no_center(rng):
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    ours = np.asarray(stft(jnp.asarray(x), 1024, 256, center=False))
    ref = _np_stft(x, 1024, 256, center=False)
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)


@pytest.mark.parametrize("n_fft,hop", [(1024, 256), (512, 128), (256, 64)])
def test_roundtrip_perfect_reconstruction(rng, n_fft, hop):
    x = rng.standard_normal((2, 8192)).astype(np.float32)
    spec = stft(jnp.asarray(x), n_fft, hop)
    y = np.asarray(istft(spec, n_fft, hop, length=8192))
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_spectrogram_power_modes(rng):
    x = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    c = spectrogram(x, power=None)
    m = spectrogram(x, power=1.0)
    p = spectrogram(x, power=2.0)
    assert np.iscomplexobj(np.asarray(c))
    np.testing.assert_allclose(np.asarray(m) ** 2, np.asarray(p), rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.asarray(c)), np.asarray(m), rtol=1e-5, atol=1e-6)


def test_inverse_spectrogram_matches_istft(rng):
    x = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32))
    spec = spectrogram(x, power=None)
    y = inverse_spectrogram(spec, length=4096)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)


def test_griffin_lim_recovers_sinusoid():
    sr, n = 16000, 8192
    t = np.arange(n) / sr
    x = (0.7 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None, :]
    power_spec = spectrogram(jnp.asarray(x), 1024, 256, power=2.0)
    y = np.asarray(griffin_lim(power_spec, 1024, 256, n_iter=32, length=n))
    # phase-agnostic check: magnitude spectrogram of output matches input's
    sy = np.abs(np.asarray(spectrogram(jnp.asarray(y), 1024, 256, power=1.0)))
    sx = np.abs(np.asarray(spectrogram(jnp.asarray(x), 1024, 256, power=1.0)))
    err = np.linalg.norm(sy - sx) / np.linalg.norm(sx)
    assert err < 0.15, f"griffin-lim spectral error {err}"


def test_window_shape():
    w = np.asarray(hann_window(1024))
    assert w.shape == (1024,) and abs(w[0]) < 1e-7 and abs(w[512] - 1.0) < 1e-6
