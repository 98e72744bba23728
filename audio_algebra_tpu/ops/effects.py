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

from .filters import sosfilt, biquad_coeffs, apply_gain_db
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


def _tpt_first_order_sos(cutoff_hz, sample_rate, kind: str):
    """First-order TPT (topology-preserving transform) filter as one SOS
    row — EXACTLY juce::dsp::FirstOrderTPTFilter, which is what
    pedalboard.{Low,High}passFilter wrap (6 dB/octave). Derivation from
    the TPT recurrence v = G(x-s); y_lp = v+s; s += 2v with
    G = g/(1+g), g = tan(pi*fc/fs):
        H_lp(z) = G(1+z^-1) / (1 + (2G-1)z^-1),   H_hp = 1 - H_lp.
    """
    fc = jnp.clip(jnp.asarray(cutoff_hz, jnp.float32), 1.0,
                  sample_rate * 0.49999)
    g = jnp.tan(math.pi * fc / sample_rate)
    G = g / (1.0 + g)
    if kind == "lowpass":
        b0, b1 = G, G
    else:                          # highpass: 1 - H_lp
        b0, b1 = 1.0 - G, -(1.0 - G)
    a1 = 2.0 * G - 1.0
    zero = jnp.zeros_like(G)
    one = jnp.ones_like(G)
    return jnp.stack([b0, b1, zero, one, a1, zero])[None, :]


def lowpass_filter(x, cutoff_hz, sample_rate=48000):
    """pedalboard.LowpassFilter(cutoff_frequency_hz): first-order TPT
    filter, 6 dB/octave — bit-matching the JUCE recurrence (see
    _tpt_first_order_sos). Reference sweeps it 50-10000 Hz log
    (xae_dataset.ipynb cell 27/33)."""
    return sosfilt(_tpt_first_order_sos(cutoff_hz, sample_rate, "lowpass"), x)


def highpass_filter(x, cutoff_hz, sample_rate=48000):
    """pedalboard.HighpassFilter: first-order TPT, 6 dB/octave."""
    return sosfilt(_tpt_first_order_sos(cutoff_hz, sample_rate, "highpass"), x)


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


def delay(x, delay_seconds, sample_rate=48000, feedback: float = 0.0,
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


# ---- Freeverb (pedalboard.Reverb == juce::Reverb == Jezar's Freeverb) ----
# The wet path — 8 parallel lowpass-feedback combs summed, then 4 series
# Schroeder allpasses — is LTI for fixed knobs, so its impulse response
# (computed ONCE per knob value by running the exact JUCE recurrence in a
# lax.scan) followed by FFT convolution reproduces pedalboard's output to
# float tolerance, while the per-sample sequential work never touches the
# audio: corpus sweeps convolve on the MXU/FFT instead of scanning every
# clip. Constants are the published Freeverb/JUCE tunings (44.1 kHz base,
# integer-rescaled to the session rate exactly as juce_Reverb.h does).
_FV_COMB_TUNINGS = (1116, 1188, 1277, 1356, 1422, 1491, 1557, 1617)
_FV_ALLPASS_TUNINGS = (556, 441, 341, 225)
_FV_STEREO_SPREAD = 23


def freeverb_ir(feedback, damp, n: int, sample_rate: int = 48000,
                spread: int = 0, dtype=jnp.float32):
    """Length-`n` impulse response of the Freeverb wet path.

    feedback = room_size*0.28 + 0.7, damp = damping*0.4 (JUCE's scale
    factors); `spread`=23 gives the right-channel tunings. Knobs may be
    traced (vmap/jit over room_size sweeps). The comb recurrence is
        out = buf[i % D];  last = out*(1-damp) + last*damp;
        buf[i % D] = in + last*feedback
    and the series allpass
        bufout = apbuf[i % d];  apbuf[i % d] = acc + bufout*0.5;
        acc = bufout - acc
    — exactly juce_Reverb.h's CombFilter/AllPassFilter processing."""
    sr = int(sample_rate)
    comb_sizes = tuple(max(sr * (t + spread) // 44100, 1)
                       for t in _FV_COMB_TUNINGS)
    ap_sizes = tuple(max(sr * (t + spread) // 44100, 1)
                     for t in _FV_ALLPASS_TUNINGS)
    nb = len(comb_sizes)
    d_max = max(comb_sizes)
    D = jnp.asarray(comb_sizes, jnp.int32)
    row = jnp.arange(nb)
    feedback = jnp.asarray(feedback, dtype)
    damp = jnp.asarray(damp, dtype)

    def step(carry, i):
        buf, last, apb = carry
        idx = jnp.mod(i, D)
        out = buf[row, idx]
        last = out * (1.0 - damp) + last * damp
        inp = jnp.where(i == 0, jnp.asarray(1.0, dtype),
                        jnp.asarray(0.0, dtype))
        buf = buf.at[row, idx].set(inp + last * feedback)
        acc = out.sum()
        new_apb = []
        for k, d in enumerate(ap_sizes):
            ai = jnp.mod(i, d)
            bufout = apb[k][ai]
            new_apb.append(apb[k].at[ai].set(acc + bufout * 0.5))
            acc = bufout - acc
        return (buf, last, tuple(new_apb)), acc

    init = (jnp.zeros((nb, d_max), dtype), jnp.zeros((nb,), dtype),
            tuple(jnp.zeros((d,), dtype) for d in ap_sizes))
    _, ir = jax.lax.scan(step, init, jnp.arange(n))
    return ir


def _fft_conv(sig, ir, n_out: int):
    """Causal convolution, first n_out samples (float32 FFT)."""
    n = sig.shape[-1] + ir.shape[-1] - 1
    nfft = 1 << (n - 1).bit_length()
    out = jnp.fft.irfft(jnp.fft.rfft(sig, nfft) * jnp.fft.rfft(ir, nfft),
                        nfft)
    return out[..., :n_out]


def reverb(x, room_size, sample_rate=48000, mix: float = 0.33,
           damping: float = 0.5, dry_level: float = 0.4,
           width: float = 1.0, freeze_mode: float = 0.0):
    """pedalboard.Reverb(room_size) — EXACT Freeverb/juce::Reverb.

    `mix` is pedalboard's wet_level (default 0.33); dry_level/width/
    freeze_mode are the remaining pedalboard knobs at their defaults.
    Stereo inputs (..., 2, T) use the JUCE stereo path: mono-sum input at
    gain 0.015 through left/right comb banks (right offset by the
    23-sample stereo spread), wet1/wet2 width mixing; other shapes run
    the processMono path per row. Same-length output (the reference
    truncates reverb tails — datasets.py:111-114). Parity: the IR-conv
    output matches a sample-by-sample NumPy rendition of the JUCE
    recurrence to ~1e-6 RMS (tests/test_effects.py); the only modeled
    deviation from pedalboard is JUCE's 10 ms parameter-smoothing ramp on
    the first ~441 samples after prepare()."""
    dtype = jnp.float32
    x32 = jnp.asarray(x, dtype)
    room = jnp.asarray(room_size, dtype)
    frozen = jnp.asarray(freeze_mode, dtype) >= 0.5
    feedback = jnp.where(frozen, 1.0, room * 0.28 + 0.7)
    damp = jnp.where(frozen, 0.0, jnp.asarray(damping, dtype) * 0.4)
    gain_in = jnp.where(frozen, 0.0, 0.015)
    wet = jnp.asarray(mix, dtype) * 3.0          # JUCE wetScaleFactor
    dry = jnp.asarray(dry_level, dtype) * 2.0    # JUCE dryScaleFactor
    wet1 = wet * (width / 2.0 + 0.5)
    wet2 = wet * ((1.0 - width) / 2.0)
    t_len = x32.shape[-1]
    if x32.ndim >= 2 and x32.shape[-2] == 2:     # JUCE processStereo
        mono_in = (x32[..., 0, :] + x32[..., 1, :]) * gain_in
        ir_l = freeverb_ir(feedback, damp, t_len, sample_rate, 0, dtype)
        ir_r = freeverb_ir(feedback, damp, t_len, sample_rate,
                           _FV_STEREO_SPREAD, dtype)
        out_l = _fft_conv(mono_in, ir_l, t_len)
        out_r = _fft_conv(mono_in, ir_r, t_len)
        y = jnp.stack([out_l * wet1 + out_r * wet2 + x32[..., 0, :] * dry,
                       out_r * wet1 + out_l * wet2 + x32[..., 1, :] * dry],
                      axis=-2)
    else:                                        # JUCE processMono
        ir = freeverb_ir(feedback, damp, t_len, sample_rate, 0, dtype)
        y = _fft_conv(x32 * gain_in, ir, t_len) * wet1 + x32 * dry
    return y


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


# name -> (fn, knob_name, lo, hi, log_scale). Ranges are the reference
# dataset factory's sweep config verbatim (xae_dataset.ipynb cell 27
# `knob_names`), and log_scale follows cell 33's rule: logspace only for
# the two Filters, linspace otherwise. Compressor carries the reference's
# fixed others={'ratio': 25}. Gain/Phaser are imported but not in the
# 10-effect list (cell 27); their ranges here are this rebuild's choice.
EFFECTS: Dict[str, Tuple[Callable, str, float, float, bool]] = {
    "Clean": (clean, "none", 0.0, 1.0, False),
    "TimeReverse": (time_reverse, "none", 0.0, 1.0, False),
    "Gain": (gain, "gain_db", -12.0, 12.0, False),
    "Distortion": (distortion, "drive_db", 0.0, 30.0, False),
    "Reverb": (reverb, "room_size", 0.01, 0.99, False),
    "Chorus": (chorus, "rate_hz", 0.5, 3.0, False),
    "Delay": (delay, "delay_seconds", 0.1, 1.0, False),
    "Phaser": (phaser, "rate_hz", 0.1, 10.0, True),
    "Compressor": (partial(compressor, ratio=25.0), "threshold_db",
                   -60.0, -3.0, False),
    "HighpassFilter": (highpass_filter, "cutoff_frequency_hz",
                       50.0, 10000.0, True),
    "LowpassFilter": (lowpass_filter, "cutoff_frequency_hz",
                      50.0, 10000.0, True),
    "PitchShift": (pitch_shift, "semitones", -12.0, 12.0, False),
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
