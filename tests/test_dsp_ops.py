"""Tests for mel / resample / filters / phase / pqmf ops."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.signal as sps

from audio_algebra_tpu.ops.mel import mel_filterbank, melspectrogram, inverse_mel_scale
from audio_algebra_tpu.ops.resample import resample
from audio_algebra_tpu.ops.filters import (
    biquad_coeffs, butter_sos, sosfilt, lowpass, highpass, bandpass, bandstop, apply_gain_db,
)
from audio_algebra_tpu.ops.phase import mag_dphase_encode, mag_dphase_decode
from audio_algebra_tpu.ops.pqmf import PQMF
from audio_algebra_tpu.ops.stft import stft, istft, spectrogram


# ------------------------------------------------------------------- mel ---

def test_mel_filterbank_shape_and_coverage():
    fb = np.asarray(mel_filterbank(513, 128, 48000))
    assert fb.shape == (513, 128)
    assert (fb >= 0).all()
    # interior mel bands have support (the first triangle can be narrower
    # than one FFT bin at 48 kHz — torchaudio produces the same empty filter)
    assert (fb.sum(0)[2:] > 0).all()
    assert (fb[5:-5].sum(1) > 0).all()


def test_melspectrogram_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    m = melspectrogram(x, 48000, 1024, 256, n_mels=80)
    assert m.shape == (2, 80, 17)
    assert bool((np.asarray(m) >= 0).all())


def test_inverse_mel_roundtrip():
    # smooth spectrum -> mel -> inverse should approximately recover it
    n_bins, n_mels = 513, 128
    fb = np.asarray(mel_filterbank(n_bins, n_mels, 48000))
    freqs = np.linspace(0, 1, n_bins)
    spec = (np.exp(-8 * (freqs - 0.3) ** 2) + 0.4 * np.exp(-30 * (freqs - 0.6) ** 2)).astype(np.float32)
    mel = spec @ fb  # (n_mels,)
    rec = np.asarray(inverse_mel_scale(jnp.asarray(mel[:, None]), n_bins, 48000, n_mels))[:, 0]
    # ignore extreme edges where mel resolution is coarse
    sl = slice(10, 450)
    err = np.linalg.norm(rec[sl] - spec[sl]) / np.linalg.norm(spec[sl])
    assert err < 0.25, err


# -------------------------------------------------------------- resample ---

def test_resample_sine_frequency_preserved():
    sr_in, sr_out, f0 = 48000, 44100, 1000.0
    t = np.arange(48000) / sr_in
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    y = np.asarray(resample(jnp.asarray(x[None]), sr_in, sr_out))[0]
    assert abs(y.shape[0] - 44100) <= 1
    # dominant frequency check
    Y = np.abs(np.fft.rfft(y[2000:-2000] * np.hanning(len(y) - 4000)))
    peak = np.argmax(Y) * sr_out / (len(y) - 4000)
    assert abs(peak - f0) < 5.0
    # amplitude preserved within 5%
    assert abs(np.abs(y[2000:-2000]).max() - 1.0) < 0.05


@pytest.mark.slow
def test_resample_roundtrip_close():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(24000).astype(np.float32)
    # band-limit the input so the round trip is well-posed
    x = np.asarray(lowpass(jnp.asarray(x[None]), 15000.0, 48000, order=8))[0]
    y = resample(jnp.asarray(x[None]), 48000, 44100)
    z = np.asarray(resample(y, 44100, 48000))[0][: len(x)]
    sl = slice(1000, -1000)
    err = np.linalg.norm(z[sl] - x[sl]) / np.linalg.norm(x[sl])
    assert err < 0.05, err


def test_resample_identity():
    x = jnp.ones((2, 100))
    assert resample(x, 48000, 48000) is x


# --------------------------------------------------------------- filters ---

@pytest.mark.slow
def test_biquad_matches_scipy_lowpass():
    b, a = biquad_coeffs("lowpass", 1000.0, 48000, q=0.707)
    rng = np.random.default_rng(2)
    x = rng.standard_normal(4096).astype(np.float32)
    ours = np.asarray(sosfilt(jnp.concatenate([b, a])[None, :], jnp.asarray(x[None])))[0]
    ref = sps.lfilter(np.asarray(b), np.asarray(a), x)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


@pytest.mark.parametrize("btype,fn,cut", [
    ("lowpass", lowpass, 2000.0),
    ("highpass", highpass, 2000.0),
])
@pytest.mark.slow
def test_butterworth_rolloff(btype, fn, cut):
    """Check the -3dB point and the stop-band attenuation direction."""
    sr, n = 48000, 32768
    rng = np.random.default_rng(3)
    x = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(fn(jnp.asarray(x[None]), cut, sr, order=4))[0]
    f, pxx = sps.welch(x, sr, nperseg=2048)
    f, pyy = sps.welch(y, sr, nperseg=2048)
    h = pyy / np.maximum(pxx, 1e-12)
    i_cut = np.argmin(np.abs(f - cut))
    i_pass = np.argmin(np.abs(f - (cut / 4 if btype == "lowpass" else cut * 4)))
    i_stop = np.argmin(np.abs(f - (cut * 4 if btype == "lowpass" else cut / 4)))
    assert 0.3 < h[i_cut] < 0.7          # ~ -3 dB at cutoff
    assert h[i_pass] > 0.7               # passband ~ unity
    assert h[i_stop] < 0.01              # >20 dB down two octaves out


@pytest.mark.slow
def test_bandpass_bandstop_complementary():
    sr, n = 48000, 32768
    rng = np.random.default_rng(4)
    x = rng.standard_normal(n).astype(np.float32)
    bp = np.asarray(bandpass(jnp.asarray(x[None]), 500.0, 2000.0, sr, order=4))[0]
    bs = np.asarray(bandstop(jnp.asarray(x[None]), 500.0, 2000.0, sr, order=4))[0]
    f, pxx = sps.welch(x, sr, nperseg=2048)
    _, pbp = sps.welch(bp, sr, nperseg=2048)
    _, pbs = sps.welch(bs, sr, nperseg=2048)
    i_mid = np.argmin(np.abs(f - 1000.0))
    i_out = np.argmin(np.abs(f - 8000.0))
    assert pbp[i_mid] / pxx[i_mid] > 0.5 and pbp[i_out] / pxx[i_out] < 0.01
    assert pbs[i_mid] / pxx[i_mid] < 0.1 and pbs[i_out] / pxx[i_out] > 0.5


def test_gain_db():
    x = jnp.ones((3,))
    np.testing.assert_allclose(np.asarray(apply_gain_db(x, 6.0)), 10 ** 0.3, rtol=1e-5)


def test_filters_jit_and_vmap():
    sr = 48000
    xs = jnp.asarray(np.random.default_rng(5).standard_normal((4, 2, 2048)).astype(np.float32))
    fn = jax.jit(jax.vmap(lambda x, c: lowpass(x, c, sr, order=4)))
    cuts = jnp.asarray([500.0, 1000.0, 2000.0, 4000.0])
    out = fn(xs, cuts)
    assert out.shape == xs.shape and np.isfinite(np.asarray(out)).all()


# ----------------------------------------------------------------- phase ---

def test_mag_dphase_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    spec = stft(x, 1024, 256)                      # (2, 513, 17)
    reps = mag_dphase_encode(spec)
    assert reps.shape == (4, 513, 17)
    spec2 = mag_dphase_decode(reps, init="true")
    y = np.asarray(istft(spec2, 1024, 256, length=4096))
    np.testing.assert_allclose(y, np.asarray(x), atol=1e-3)


# ------------------------------------------------------------------ pqmf ---

@pytest.mark.parametrize("bands", [2, 4, 8])
def test_pqmf_near_perfect_reconstruction(bands):
    pqmf = PQMF(bands, 70)
    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 2, 4096)).astype(np.float32) * 0.5
    sub = pqmf.analysis(jnp.asarray(x))
    assert sub.shape[-2] == 2 * bands
    assert sub.shape[-1] == 4096 // bands
    rec = np.asarray(pqmf.synthesis(sub))
    assert rec.shape == x.shape
    # delay is compensated internally; skip the filter-length edge transient
    edge = pqmf.taps
    err = np.mean((rec[..., edge:-edge] - x[..., edge:-edge]) ** 2)
    ref_power = np.mean(x[..., edge:-edge] ** 2)
    assert err / ref_power < 1e-4, err / ref_power


def test_pqmf_identity_single_band():
    pqmf = PQMF(1)
    x = jnp.ones((2, 3, 64))
    assert pqmf.analysis(x) is x and pqmf.synthesis(x) is x
