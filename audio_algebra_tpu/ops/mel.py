"""Mel filterbank ops: MelSpectrogram / InverseMelScale equivalents.

Replaces torchaudio.transforms.{MelSpectrogram, InverseMelScale} used by the
reference MelSpectrogramAE (given_models.py:267-269). The mel projection is a
single (n_bins -> n_mels) matmul fused behind the STFT matmul, so
melspectrogram is two chained MXU ops. The inverse uses a precomputed
regularised least-squares solve (torchaudio's iterative SGD estimator is a
poor fit for TPU and strictly worse numerically).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .stft import spectrogram


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=16)
def _mel_fb_np(
    n_bins: int, n_mels: int, sample_rate: int, f_min: float, f_max: float | None, norm: str | None
) -> np.ndarray:
    """Triangular mel filterbank (n_bins, n_mels), HTK scale — torchaudio default."""
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0, sample_rate // 2, n_bins)
    m_pts = np.linspace(_hz_to_mel(f_min), _hz_to_mel(f_max), n_mels + 2)
    f_pts = _mel_to_hz(m_pts)
    f_diff = np.diff(f_pts)
    slopes = f_pts[None, :] - all_freqs[:, None]          # (n_bins, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb *= enorm[None, :]
    return fb.astype(np.float32)


def mel_filterbank(
    n_bins: int,
    n_mels: int = 128,
    sample_rate: int = 48000,
    f_min: float = 0.0,
    f_max: float | None = None,
    norm: str | None = None,
) -> jnp.ndarray:
    """Mel filterbank matrix (n_bins, n_mels)."""
    return jnp.asarray(_mel_fb_np(n_bins, n_mels, sample_rate, f_min, f_max, norm))


def melspectrogram(
    x: jnp.ndarray,
    sample_rate: int = 48000,
    n_fft: int = 1024,
    hop_length: int = 256,
    n_mels: int = 128,
    power: float = 2.0,
    f_min: float = 0.0,
    f_max: float | None = None,
    norm: str | None = None,
    center: bool = True,
) -> jnp.ndarray:
    """(..., T) -> (..., n_mels, F). torchaudio MelSpectrogram defaults."""
    spec = spectrogram(x, n_fft=n_fft, hop_length=hop_length, power=power, center=center)
    fb = mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate, f_min, f_max, norm)
    # (..., n_bins, F): contract the bin axis -> (..., n_mels, F)
    return jnp.einsum("...bf,bm->...mf", spec, fb)


@functools.lru_cache(maxsize=16)
def _mel_pinv_np(
    n_bins: int, n_mels: int, sample_rate: int, f_min: float, f_max: float | None, norm: str | None
) -> np.ndarray:
    """Tikhonov-regularised pseudo-inverse of the mel filterbank (n_mels, n_bins)."""
    fb = _mel_fb_np(n_bins, n_mels, sample_rate, f_min, f_max, norm)  # (n_bins, n_mels)
    a = fb.T @ fb + 1e-8 * np.eye(n_mels, dtype=np.float64)
    pinv = np.linalg.solve(a, fb.T)                        # (n_mels, n_bins)
    return pinv.astype(np.float32)


def inverse_mel_scale(
    melspec: jnp.ndarray,
    n_stft: int,
    sample_rate: int = 48000,
    n_mels: int = 128,
    f_min: float = 0.0,
    f_max: float | None = None,
    norm: str | None = None,
) -> jnp.ndarray:
    """(..., n_mels, F) -> (..., n_stft, F) nonnegative spectrogram estimate.

    One matmul with a cached regularised pinv + clamp-at-zero — replaces
    torchaudio InverseMelScale's on-device SGD loop (given_models.py:268).
    """
    pinv = jnp.asarray(_mel_pinv_np(n_stft, n_mels, sample_rate, f_min, f_max, norm))
    spec = jnp.einsum("...mf,mb->...bf", melspec, pinv)
    return jnp.maximum(spec, 0.0)
