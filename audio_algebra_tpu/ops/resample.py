"""Polyphase sample-rate conversion as a blocked matmul (MXU formulation).

Replaces torchaudio.transforms.Resample (reference DMAE1d wraps its model in
48k<->44.1k resamples, given_models.py:445-446,482-494).

TPU-first: a rational resampler (up L, down M) is y[bL+r] = Σ_u x[bM+u] ·
K[u, r] — every output block of L samples is a linear map of a W-sample
input window sliding by M. So the whole op is

    frame(x, width=W, stride=M)  @  K[W, L]      (one batched MXU matmul)

instead of an lhs-dilated convolution (which XLA lowers poorly at L=160 and
whose executable destabilised the axon compile service — see git history).
The windowed-sinc kernel follows the torchaudio sinc_interp_hann recipe
(lowpass_filter_width=6, rolloff=0.99) so outputs track the reference
front-end numerically.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def resample_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> tuple[np.ndarray, int, int, int]:
    """Windowed-sinc filter taps. Returns (taps[K], L, M, K); unit-DC·L gain."""
    g = math.gcd(orig_freq, new_freq)
    L, M = new_freq // g, orig_freq // g
    base_freq = min(orig_freq, new_freq) * rolloff / 2.0  # cutoff in Hz
    width = int(math.ceil(lowpass_filter_width * orig_freq * L / base_freq))
    t = (np.arange(-width, width + 1, dtype=np.float64)) / (orig_freq * L)
    kernel = 2 * base_freq / (orig_freq * L) * np.sinc(2 * base_freq * t)
    window = np.cos(np.pi * t * base_freq / lowpass_filter_width / 2) ** 2
    kernel = kernel * window
    kernel = kernel / kernel.sum() * L
    return kernel.astype(np.float32), L, M, len(kernel)


@functools.lru_cache(maxsize=32)
def _block_matrix(orig_freq: int, new_freq: int, lowpass_filter_width: int, rolloff: float):
    """Precompute (halo, W, A[W, L]) for the blocked-matmul formulation.

    Derivation: with the centered kernel k (length K, center pad=K//2), the
    conv-with-zero-stuffing resampler is y[j] = Σ_s x[s]·k[sL − jM + pad].
    Writing j = bL + r and s = bM + u gives y[bL+r] = Σ_u x[bM+u]·A[u, r]
    with A[u, r] = k[uL − rM + pad]  — block-independent, so one matrix.
    """
    k, L, M, K = resample_kernel(orig_freq, new_freq, lowpass_filter_width, rolloff)
    pad = K // 2
    u_lo = -(pad // L + 1)
    u_hi = ((L - 1) * M - pad + K - 1) // L + 1
    W = u_hi - u_lo + 1
    u = np.arange(u_lo, u_hi + 1)[:, None]          # (W, 1)
    r = np.arange(L)[None, :]                        # (1, L)
    idx = u * L - r * M + pad                        # (W, L)
    valid = (idx >= 0) & (idx < K)
    A = np.where(valid, k[np.clip(idx, 0, K - 1)], 0.0).astype(np.float32)
    return -u_lo, W, A, L, M


def resample_np(x: np.ndarray, orig_freq: int, new_freq: int,
                lowpass_filter_width: int = 6, rolloff: float = 0.99) -> np.ndarray:
    """Host-side numpy twin of `resample` (same blocked-matmul kernel).

    The data pipeline (load_audio) uses this: audio files have arbitrary
    lengths, and a device resample would compile one program per length —
    pathological on backends with slow compiles. Identical math, same
    cached block matrix.
    """
    if orig_freq == new_freq:
        return np.asarray(x)
    halo, W, A, L, M = _block_matrix(orig_freq, new_freq, lowpass_filter_width, rolloff)
    x = np.asarray(x, np.float32)
    t_in = x.shape[-1]
    t_out = int(math.ceil(t_in * L / M))
    n_blocks = -(-t_out // L)
    pad_left = halo
    pad_right = max(0, (n_blocks - 1) * M + (W - halo) - t_in)
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad_left, pad_right)])
    idx = np.arange(n_blocks)[:, None] * M + np.arange(W)[None, :]
    frames = xp[..., idx]
    y = frames @ A
    return y.reshape(*x.shape[:-1], n_blocks * L)[..., :t_out]


def resample(
    x: jnp.ndarray,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> jnp.ndarray:
    """Resample (..., T) from orig_freq to new_freq. Output length ceil(T·L/M)."""
    if orig_freq == new_freq:
        return x
    halo, W, A, L, M = _block_matrix(orig_freq, new_freq, lowpass_filter_width, rolloff)
    t_in = x.shape[-1]
    t_out = int(math.ceil(t_in * L / M))
    n_blocks = -(-t_out // L)                        # output blocks of L samples

    pad_left = halo
    pad_right = max(0, (n_blocks - 1) * M + (W - halo) - t_in)
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad_left, pad_right)])

    idx = np.arange(n_blocks)[:, None] * M + np.arange(W)[None, :]
    frames = xp[..., idx]                            # (..., n_blocks, W)
    y = jnp.matmul(frames, jnp.asarray(A), preferred_element_type=jnp.float32)
    y = y.reshape(*x.shape[:-1], n_blocks * L)
    return y[..., :t_out]
