"""Tests for the pedalboard-capability effect bank."""
import numpy as np
import jax.numpy as jnp
import pytest

from audio_algebra_tpu.ops.effects import (
    EFFECTS, knob_sweep, apply_effect,
    clean, time_reverse, gain, distortion, reverb, chorus, delay,
    phaser, compressor, highpass_filter, lowpass_filter, pitch_shift,
)

SR = 48000


@pytest.fixture(scope="module")
def tone():
    t = np.arange(16384) / SR
    x = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1765 * t)
    return jnp.asarray(np.stack([x, x]).astype(np.float32))


def test_effect_registry_has_reference_names():
    # the 10 pedalboard effects + Clean/TimeReverse (reference xae cell 27)
    for name in ("Clean", "TimeReverse", "Gain", "Distortion", "Reverb",
                 "Chorus", "Delay", "Phaser", "Compressor",
                 "HighpassFilter", "LowpassFilter", "PitchShift"):
        assert name in EFFECTS


def test_knob_sweeps():
    lin = knob_sweep("Gain", 32)
    assert lin.shape == (32,) and lin[0] == -12.0 and lin[-1] == 12.0
    log = knob_sweep("LowpassFilter", 32)
    assert abs(log[0] - 150.0) < 1e-6 and abs(log[-1] - 7500.0) < 1e-3
    # log sweep: ratios constant
    r = log[1:] / log[:-1]
    np.testing.assert_allclose(r, r[0], rtol=1e-5)


def test_clean_and_reverse(tone):
    np.testing.assert_array_equal(np.asarray(clean(tone)), np.asarray(tone))
    rev = time_reverse(tone)
    np.testing.assert_allclose(np.asarray(rev)[..., ::-1], np.asarray(tone))


def test_distortion_saturates(tone):
    y = np.asarray(distortion(tone, 30.0))
    assert np.abs(y).max() <= 1.0
    # heavy drive flattens peaks toward square -> higher RMS/peak ratio
    crest_in = np.abs(np.asarray(tone)).max() / np.sqrt((np.asarray(tone) ** 2).mean())
    crest_out = np.abs(y).max() / np.sqrt((y**2).mean())
    assert crest_out < crest_in


def test_compressor_reduces_dynamics(tone):
    loud = tone * 0.9
    y = np.asarray(compressor(loud, -30.0))
    assert np.abs(y).max() < np.abs(np.asarray(loud)).max()
    # quiet signal below threshold ~unaffected
    quiet = tone * 0.01
    yq = np.asarray(compressor(quiet, -30.0))
    np.testing.assert_allclose(yq, np.asarray(quiet), atol=5e-3)


def test_delay_adds_echo(tone):
    y = np.asarray(delay(tone, 0.1, mix=1.0, feedback=0.0, n_taps=1))
    shift = int(0.1 * SR)
    np.testing.assert_allclose(y[..., shift:shift + 1000],
                               np.asarray(tone)[..., :1000], atol=1e-5)
    assert np.abs(y[..., :shift]).max() < 1e-6   # silence before first echo


def test_reverb_lengthens_energy_tail(tone):
    x = np.asarray(tone).copy()
    x[..., 8192:] = 0.0      # impulse-ish: second half silent
    y = np.asarray(reverb(jnp.asarray(x), 0.8, mix=0.5))
    tail_in = np.abs(x[..., 12000:]).sum()
    tail_out = np.abs(y[..., 12000:]).sum()
    assert tail_in == 0 and tail_out > 0.1
    assert y.shape == x.shape


@pytest.mark.slow
def test_chorus_and_phaser_shapes(tone):
    for fn, knob in ((chorus, 1.0), (phaser, 0.5)):
        y = np.asarray(fn(tone, knob))
        assert y.shape == tone.shape and np.isfinite(y).all()
        assert not np.allclose(y, np.asarray(tone))


@pytest.mark.slow
def test_filters(tone):
    lo = np.asarray(lowpass_filter(tone, 800.0))
    hi = np.asarray(highpass_filter(tone, 800.0))
    spec = np.abs(np.fft.rfft(np.asarray(tone)[0]))
    spec_lo = np.abs(np.fft.rfft(lo[0]))
    spec_hi = np.abs(np.fft.rfft(hi[0]))
    f440 = int(440 * 16384 / SR)
    f1765 = int(1765 * 16384 / SR)
    assert spec_lo[f440] / spec[f440] > 0.7
    assert spec_lo[f1765] / spec[f1765] < 0.3
    assert spec_hi[f440] / spec[f440] < 0.3
    assert spec_hi[f1765] / spec[f1765] > 0.7


def test_pitch_shift_moves_fundamental():
    t = np.arange(32768) / SR
    x = jnp.asarray((0.6 * np.sin(2 * np.pi * 440 * t)).astype(np.float32))[None]
    y = np.asarray(pitch_shift(x, 12.0))        # +1 octave
    assert y.shape == x.shape
    spec = np.abs(np.fft.rfft(y[0, 4096:28672] * np.hanning(24576)))
    peak_hz = np.argmax(spec) * SR / 24576
    assert abs(peak_hz - 880) < 40, peak_hz


def test_apply_effect_by_name(tone):
    y = apply_effect("Gain", tone, 6.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(tone) * 10 ** 0.3,
                               rtol=1e-5)


@pytest.mark.slow
def test_phaser_reverb_traced_knobs_jit_vmap(tone):
    """Every effect's knob must trace (the module contract: 'knob sweeps
    vmap/jit on device') — phaser and reverb used host-side math.sin /
    float() on the knob and crashed under jit until round 2."""
    import jax
    from audio_algebra_tpu.ops.effects import apply_effect

    for name in ("Phaser", "Reverb"):
        y = jax.jit(lambda k, n=name: apply_effect(n, tone, k, 48000))(
            jnp.float32(0.6))
        assert y.shape == tone.shape and bool(jnp.isfinite(y).all())
        ys = jax.vmap(lambda k, n=name: apply_effect(n, tone, k, 48000))(
            jnp.linspace(0.1, 0.9, 3))
        assert ys.shape == (3, *tone.shape)
        # distinct knob values produce distinct outputs
        assert float(jnp.abs(ys[0] - ys[2]).max()) > 1e-6


def test_pitch_shift_first_frame_phase_clean():
    """dphase frame 0 must not inherit the roll() wrap-around (a bogus
    constant per-bin offset through the cumsum). A pure tone's shifted
    output should stay phase-coherent from the very first samples."""
    from audio_algebra_tpu.ops.effects import pitch_shift

    sr = 48000
    t = np.arange(16384) / sr
    x = jnp.asarray(np.sin(2 * np.pi * 440.0 * t, dtype=np.float32))[None]
    y = np.asarray(pitch_shift(x, 12.0, sr))
    # the head of the output (first synthesis frames) carries real energy,
    # comparable to the steady state — the wrap bug scrambled it
    head = float(np.sqrt((y[0, 512:2048] ** 2).mean()))
    mid = float(np.sqrt((y[0, 6000:10000] ** 2).mean()))
    assert head > 0.25 * mid, (head, mid)
