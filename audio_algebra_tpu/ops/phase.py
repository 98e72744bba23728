"""Magnitude + phase-difference spectrogram coding.

The reference MagDPhaseSpectrogramAE integrates phase with a Python loop over
time steps (`for t in range(...): theta[t] = theta[t-1] + dtheta[t]`,
reference given_models.py:247-249). On TPU that is one cumulative sum along
the frame axis — a single XLA op. Wrap-to-[0,2π) is irrelevant under cos/sin
so the decode stays a pure cumsum.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

TWO_PI = 2.0 * math.pi


def mag_dphase_encode(spec: jnp.ndarray, use_cos: bool = False) -> jnp.ndarray:
    """Complex spectrogram (..., C, bins, F) -> stacked (..., 2C, bins, F).

    First C channels are magnitudes, last C are phase increments dtheta
    (forced non-negative as in the reference) with theta[0] stored at frame 0.
    `use_cos=True` reproduces the reference's vector-cosine variant
    (given_models.py:218-225).
    """
    mag = jnp.abs(spec)
    theta = jnp.angle(spec)
    if use_cos:
        x, y = jnp.real(spec), jnp.imag(spec)
        mag_tm1 = jnp.roll(mag, 1, -1)
        x_tm1, y_tm1 = jnp.roll(x, 1, -1), jnp.roll(y, 1, -1)
        num, den = x * x_tm1 + y * y_tm1, mag * mag_tm1
        acos_arg = jnp.clip(jnp.where(den == 0, 1.0, num / jnp.maximum(den, 1e-20)), -1, 1)
        dtheta = jnp.arccos(acos_arg)
    else:
        theta_tm1 = jnp.roll(theta, 1, -1)
        dtheta = theta - theta_tm1
        dtheta = jnp.where(dtheta < 0, dtheta + TWO_PI, dtheta)
    dtheta = dtheta.at[..., 0].set(theta[..., 0])
    return jnp.concatenate([mag, dtheta], axis=-3)


def phase_integrate(dtheta: jnp.ndarray, init: str = "true", key: jax.Array | None = None) -> jnp.ndarray:
    """Integrate phase increments along the last (frame) axis.

    init='true' uses dtheta[...,0] as theta_0 (reference default
    given_models.py:243-244); 'rand' draws theta_0 uniform; 'zero' starts at 0.
    """
    if init == "true":
        first = dtheta[..., :1]
    elif init == "rand":
        if key is None:
            key = jax.random.PRNGKey(0)
        # uniform on the full circle — without the TWO_PI the "random"
        # origin was confined to a 1-radian arc
        first = jax.random.uniform(key, dtheta[..., :1].shape) * TWO_PI
    elif init == "zero":
        first = jnp.zeros_like(dtheta[..., :1])
    else:
        raise ValueError(f"unknown init {init!r}")
    seq = jnp.concatenate([first, dtheta[..., 1:]], axis=-1)
    return jnp.cumsum(seq, axis=-1)


def mag_dphase_decode(reps: jnp.ndarray, init: str = "true", key: jax.Array | None = None) -> jnp.ndarray:
    """Inverse of mag_dphase_encode -> complex spectrogram (..., C, bins, F)."""
    nc = reps.shape[-3] // 2
    mag, dtheta = reps[..., :nc, :, :], reps[..., nc:, :, :]
    theta = phase_integrate(dtheta, init=init, key=key)
    return jax.lax.complex(mag * jnp.cos(theta), mag * jnp.sin(theta))
