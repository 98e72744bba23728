"""ITU-R BS.1770 loudness (pyloudnorm capability).

The reference's dataset factory normalises clips by integrated loudness
(pyloudnorm, reference xae_dataset.ipynb cell 20). This is the BS.1770-4
recipe in JAX: K-weighting (shelf + highpass biquads) -> 400 ms gated mean
square -> -70 LUFS absolute + relative -10 LU gating -> LUFS.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .filters import sosfilt


def _k_weighting_sos(sr: int) -> jnp.ndarray:
    """BS.1770 stage-1 high-shelf + stage-2 highpass, bilinear-matched.

    Coefficients follow the ITU spec's analog prototypes; exact published
    values at 48 kHz, redesigned for other rates.
    """
    if sr == 48000:
        shelf_b = [1.53512485958697, -2.69169618940638, 1.19839281085285]
        shelf_a = [1.0, -1.69065929318241, 0.73248077421585]
        hp_b = [1.0, -2.0, 1.0]
        hp_a = [1.0, -1.99004745483398, 0.99007225036621]
    else:
        # redesign via the analog prototype (db=3.999843, f=1681.97, Q=0.7071)
        def shelf(sr):
            f0, G, Q = 1681.9744509555319, 3.99984385397, 0.7071752369554196
            K = math.tan(math.pi * f0 / sr)
            Vh = 10 ** (G / 20.0)
            Vb = Vh ** 0.4996667741545416
            a0 = 1.0 + K / Q + K * K
            b = [(Vh + Vb * K / Q + K * K) / a0,
                 2.0 * (K * K - Vh) / a0,
                 (Vh - Vb * K / Q + K * K) / a0]
            a = [1.0, 2.0 * (K * K - 1.0) / a0, (1.0 - K / Q + K * K) / a0]
            return b, a

        def hp(sr):
            f0, Q = 38.13547087602444, 0.5003270373238773
            K = math.tan(math.pi * f0 / sr)
            a = [1.0, 2.0 * (K * K - 1.0) / (1.0 + K / Q + K * K),
                 (1.0 - K / Q + K * K) / (1.0 + K / Q + K * K)]
            b = [1.0, -2.0, 1.0]
            return b, a

        shelf_b, shelf_a = shelf(sr)
        hp_b, hp_a = hp(sr)
    return jnp.asarray([shelf_b + shelf_a, hp_b + hp_a], jnp.float32)


def integrated_loudness(audio, sample_rate: int = 48000) -> float:
    """(C, T) or (T,) -> integrated loudness in LUFS (pyloudnorm.Meter
    capability)."""
    x = jnp.asarray(audio, jnp.float32)
    if x.ndim == 1:
        x = x[None]
    sos = _k_weighting_sos(sample_rate)
    xw = sosfilt(sos, x)
    # BS.1770-4 channel weights (L, R, C, Ls, Rs ordering): the surround
    # pair weighs 1.41; mono/stereo are all-ones so the dataset paths are
    # unchanged
    g = np.ones(xw.shape[0], np.float32)
    g[3:5] = 1.41
    g = jnp.asarray(g)
    block = int(0.400 * sample_rate)
    hop = int(0.100 * sample_rate)
    t = xw.shape[-1]
    if t < block:
        ms = (g * jnp.mean(jnp.square(xw), axis=-1)).sum()
        return float(-0.691 + 10.0 * jnp.log10(jnp.maximum(ms, 1e-12)))
    n_blocks = 1 + (t - block) // hop
    idx = np.arange(n_blocks)[:, None] * hop + np.arange(block)[None, :]
    frames = xw[..., idx]                                # (C, n_blocks, block)
    ms = (g[:, None]
          * jnp.mean(jnp.square(frames), axis=-1)).sum(axis=0)  # weighted
    lk = -0.691 + 10.0 * jnp.log10(jnp.maximum(ms, 1e-12))
    # absolute gate at -70 LUFS
    abs_mask = lk > -70.0
    ms_abs = jnp.where(abs_mask, ms, 0.0)
    denom = jnp.maximum(abs_mask.sum(), 1)
    l_abs = -0.691 + 10.0 * jnp.log10(jnp.maximum(ms_abs.sum() / denom, 1e-12))
    # relative gate at l_abs - 10
    rel_mask = abs_mask & (lk > (l_abs - 10.0))
    ms_rel = jnp.where(rel_mask, ms, 0.0)
    denom2 = jnp.maximum(rel_mask.sum(), 1)
    return float(-0.691 + 10.0 * jnp.log10(jnp.maximum(ms_rel.sum() / denom2, 1e-12)))


def loudness_normalize(audio, target_lufs: float = -23.0,
                       sample_rate: int = 48000, max_gain_db: float = 40.0):
    """Gain audio to the target integrated loudness (pyloudnorm.normalize)."""
    x = np.asarray(audio, np.float32)
    lufs = integrated_loudness(x, sample_rate)
    gain_db = np.clip(target_lufs - lufs, -max_gain_db, max_gain_db)
    return x * (10.0 ** (gain_db / 20.0)), lufs


def maxabs_normalize(audio, peak: float = 0.95):
    """Peak normalisation (the reference's maxabs option, xae cell 20)."""
    x = np.asarray(audio, np.float32)
    m = np.abs(x).max()
    return x * (peak / max(m, 1e-9)), float(m)
