"""Effect bank — pedalboard (JUCE C++) capability in JAX.

The reference's dataset factory sweeps 10 pedalboard effects with one named
knob each plus custom Clean/TimeReverse (reference xae_dataset.ipynb cell
27; effects_explorer.ipynb cells 19-26 sweeps 32 knob values per effect).
This module provides the same effect names and knob semantics as pure JAX
transforms so knob sweeps vmap/jit on device — corpus generation runs as
batched TPU programs instead of per-file JUCE calls in worker processes.

Each effect is `apply(x, knob, sample_rate)` with knob in the reference
sweep range; `EFFECTS` maps names to (fn, knob_name, lo, hi, log_scale).
Stateful-tail effects (Reverb, Delay) return same-length output (the
reference truncates tails anyway — datasets.py:111-114).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .filters import butter_sos, sosfilt, biquad_coeffs, apply_gain_db
from .stft import stft, istft
from .resample import resample


def clean(x, knob=0.0, sample_rate=48000):
    """Identity (reference xae Clean)."""
    return x


def time_reverse(x, knob=0.0, sample_rate=48000):
    """Reverse time axis (reference xae TimeReverse)."""
    return x[..., ::-1]


def gain(x, gain_db, sample_rate=48000):
    return apply_gain_db(x, gain_db)


def distortion(x, drive_db, sample_rate=48000):
    """pedalboard.Distortion(drive_db): tanh waveshaper with input gain."""
    g = 10.0 ** (jnp.asarray(drive_db, jnp.float32) / 20.0)
    return jnp.tanh(g * x)


def lowpass_filter(x, cutoff_hz, sample_rate=48000):
    """pedalboard.LowpassFilter(cutoff_frequency_hz): 1-pole-ish -> order-2."""
    return sosfilt(butter_sos(2, cutoff_hz, sample_rate, "lowpass"), x)


def highpass_filter(x, cutoff_hz, sample_rate=48000):
    return sosfilt(butter_sos(2, cutoff_hz, sample_rate, "highpass"), x)


def compressor(x, threshold_db, sample_rate=48000, ratio: float = 4.0,
               attack_ms: float = 1.0, release_ms: float = 100.0):
    """pedalboard.Compressor(threshold_db): envelope-follower gain computer.

    One lax.scan over time for the attack/release envelope (inherently
    sequential), vectorised over channels/batch.
    """
    a_att = math.exp(-1.0 / (attack_ms * 1e-3 * sample_rate))
    a_rel = math.exp(-1.0 / (release_ms * 1e-3 * sample_rate))
    level = jnp.abs(x)
    lt = jnp.moveaxis(level, -1, 0)

    def step(env, l):
        coeff = jnp.where(l > env, a_att, a_rel)
        env2 = coeff * env + (1 - coeff) * l
        return env2, env2

    _, env = jax.lax.scan(step, jnp.zeros(lt.shape[1:], lt.dtype), lt)
    env_db = 20.0 * jnp.log10(jnp.maximum(jnp.moveaxis(env, 0, -1), 1e-6))
    over = jnp.maximum(env_db - threshold_db, 0.0)
    gain_db_ = -over * (1.0 - 1.0 / ratio)
    return x * 10.0 ** (gain_db_ / 20.0)


def delay(x, delay_seconds, sample_rate=48000, feedback: float = 0.3,
          mix: float = 0.5, n_taps: int = 4):
    """pedalboard.Delay(delay_seconds): feedback delay via a static tap sum
    (n_taps echoes with feedback^k gain) — no scan, fully parallel."""
    d = jnp.asarray(delay_seconds, jnp.float32)
    t_len = x.shape[-1]
    idx = jnp.arange(t_len)
    wet = jnp.zeros_like(x)
    for k in range(1, n_taps + 1):
        shift = (d * sample_rate * k).astype(jnp.int32)
        src = jnp.clip(idx - shift, 0, t_len - 1)
        tap = jnp.take(x, src, axis=-1) * (feedback ** (k - 1))
        tap = tap * (idx >= shift)
        wet = wet + tap
    return (1 - mix) * x + mix * wet


def chorus(x, rate_hz, sample_rate=48000, depth_ms: float = 7.0,
           centre_ms: float = 8.0, mix: float = 0.5):
    """pedalboard.Chorus(rate_hz): LFO-modulated fractional delay line."""
    t_len = x.shape[-1]
    n = jnp.arange(t_len, dtype=jnp.float32)
    lfo = jnp.sin(2 * math.pi * jnp.asarray(rate_hz, jnp.float32) * n / sample_rate)
    delay_samp = (centre_ms + depth_ms * 0.5 * lfo) * 1e-3 * sample_rate
    pos = jnp.clip(n - delay_samp, 0.0, t_len - 1.001)
    i0 = pos.astype(jnp.int32)
    frac = pos - i0
    wet = jnp.take(x, i0, axis=-1) * (1 - frac) + jnp.take(x, i0 + 1, axis=-1) * frac
    return (1 - mix) * x + mix * wet


def phaser(x, rate_hz, sample_rate=48000, depth: float = 0.8,
           centre_hz: float = 1300.0, mix: float = 0.5, stages: int = 4):
    """pedalboard.Phaser(rate_hz): cascaded sweeping allpass biquads.

    The LFO is frozen per-block into 8 segments (piecewise-constant sweep)
    so each segment is a static-coefficient biquad cascade — a TPU-friendly
    approximation of the continuous sweep.
    """
    t_len = x.shape[-1]
    n_seg = 8
    seg = t_len // n_seg
    outs = []
    rate = jnp.asarray(rate_hz, jnp.float32)   # traced knobs must vmap/jit
    for s in range(n_seg):
        phase = 2 * math.pi * rate * (s * seg / sample_rate)
        f = centre_hz * (1.0 + depth * 0.5 * jnp.sin(phase))
        b, a = biquad_coeffs("notch", f, sample_rate, q=0.7)
        sos = jnp.concatenate([b, a])[None, :].repeat(stages // 2, axis=0)
        outs.append(sosfilt(sos, x[..., s * seg:(s + 1) * seg]))
    rem = x[..., n_seg * seg:]
    wet = jnp.concatenate(outs + ([rem] if rem.shape[-1] else []), axis=-1)
    return (1 - mix) * x + mix * wet


def _synthetic_ir(room_size, sample_rate: int, seconds: float = 1.5,
                  seed: int = 0) -> jnp.ndarray:
    """Exponentially-decaying noise IR; decay time scales with room_size.
    The noise draw is static (host-side); the decay envelope is traced so
    room_size knob sweeps vmap/jit on device like every other effect."""
    n = int(seconds * sample_rate)
    rng = np.random.default_rng(seed)
    noise = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    t60 = 0.2 + 2.3 * jnp.asarray(room_size, jnp.float32)   # 0.2s .. 2.5s
    decay = jnp.exp(-6.908 * jnp.arange(n) / (t60 * sample_rate))
    ir = (noise * decay).at[0].set(1.0)
    return ir / jnp.sqrt(jnp.sum(jnp.square(ir)))


def reverb(x, room_size, sample_rate=48000, mix: float = 0.33,
           ir_seconds: float = 1.5):
    """pedalboard.Reverb(room_size): FFT convolution with a synthetic
    exponential-decay IR (same-length output; the reference truncates
    reverb tails — datasets.py:111-114). The convolution runs as framed
    DFT matmuls (overlap-add), MXU-shaped."""
    ir = _synthetic_ir(room_size, sample_rate, ir_seconds)
    t_len = x.shape[-1]
    n_ir = ir.shape[0]
    # frequency-domain convolution via our DFT-matmul stft machinery is
    # overkill for one IR; use jnp.convolve per channel (XLA lowers to FFT
    # or implicit GEMM) with 'full' then truncate.
    flat = x.reshape(-1, t_len)
    wet = jax.vmap(lambda ch: jnp.convolve(ch, ir)[:t_len])(flat)
    wet = wet.reshape(x.shape)
    return (1 - mix) * x + mix * wet


def pitch_shift(x, semitones, sample_rate=48000, n_fft: int = 2048,
                hop: int = 512):
    """pedalboard.PitchShift(semitones): phase-vocoder time-stretch +
    resample. `semitones` must be static (shape-changing resample inside).
    """
    ratio = 2.0 ** (float(semitones) / 12.0)
    t_len = x.shape[-1]
    spec = stft(x, n_fft, hop)                        # (..., bins, F)
    mag, phase = jnp.abs(spec), jnp.angle(spec)
    n_frames = spec.shape[-1]
    # time-stretch to duration T·ratio (pitch-preserving), then decimate by
    # ratio below — which multiplies all frequencies by ratio
    out_frames = max(int(n_frames * ratio), 2)
    pos = jnp.linspace(0, n_frames - 1.001, out_frames)
    i0 = pos.astype(jnp.int32)
    frac = (pos - i0)[None, :]
    mag_i = jnp.take(mag, i0, axis=-1) * (1 - frac) + \
        jnp.take(mag, jnp.minimum(i0 + 1, n_frames - 1), axis=-1) * frac
    dphase = phase - jnp.roll(phase, 1, axis=-1)
    omega = 2 * math.pi * jnp.arange(spec.shape[-2]) * hop / n_fft
    # frame 0 has no predecessor: roll wraps to the LAST frame, leaving a
    # bogus per-bin phase offset that every later frame inherits through
    # the cumsum; pin it to the nominal advance (dev = 0) instead
    dphase = dphase.at[..., 0].set(
        jnp.broadcast_to(omega[:, None], dphase[..., :1].shape)[..., 0])
    dev = dphase - omega[:, None]
    dev = jnp.mod(dev + math.pi, 2 * math.pi) - math.pi
    inst = (omega[:, None] + dev)
    inst_i = jnp.take(inst, i0, axis=-1)
    new_phase = jnp.cumsum(inst_i, axis=-1)
    stretched = istft(jax.lax.complex(mag_i * jnp.cos(new_phase),
                                      mag_i * jnp.sin(new_phase)), n_fft, hop)
    # stretched duration = t·ratio; decimate by ratio -> original duration,
    # frequencies scaled by ratio
    up, down = max(int(round(ratio * 1000)), 1), 1000
    g = math.gcd(up, down)
    shifted = resample(stretched, up // g, down // g)
    out = shifted[..., :t_len]
    if out.shape[-1] < t_len:
        out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, t_len - out.shape[-1])])
    return out


# name -> (fn, knob_name, lo, hi, log_scale)  — reference xae cell 27/33
EFFECTS: Dict[str, Tuple[Callable, str, float, float, bool]] = {
    "Clean": (clean, "none", 0.0, 1.0, False),
    "TimeReverse": (time_reverse, "none", 0.0, 1.0, False),
    "Gain": (gain, "gain_db", -12.0, 12.0, False),
    "Distortion": (distortion, "drive_db", 0.0, 30.0, False),
    "Reverb": (reverb, "room_size", 0.0, 1.0, False),
    "Chorus": (chorus, "rate_hz", 0.1, 10.0, True),
    "Delay": (delay, "delay_seconds", 0.05, 0.5, False),
    "Phaser": (phaser, "rate_hz", 0.1, 10.0, True),
    "Compressor": (compressor, "threshold_db", -40.0, 0.0, False),
    "HighpassFilter": (highpass_filter, "cutoff_frequency_hz", 20.0, 2400.0, True),
    "LowpassFilter": (lowpass_filter, "cutoff_frequency_hz", 150.0, 7500.0, True),
    "PitchShift": (pitch_shift, "semitones", -6.0, 6.0, False),
}


def knob_sweep(name: str, n: int = 32) -> np.ndarray:
    """Linear or log knob sweep (reference xae cell 33)."""
    fn, knob, lo, hi, log_scale = EFFECTS[name]
    if log_scale:
        return np.exp(np.linspace(np.log(lo), np.log(hi), n))
    return np.linspace(lo, hi, n)


def apply_effect(name: str, x, knob_value, sample_rate: int = 48000):
    fn = EFFECTS[name][0]
    return fn(x, knob_value, sample_rate)
