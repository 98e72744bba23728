"""v-objective DDIM sampler with cosine + "crash" schedules.

Math matches the reference exactly (get_alphas_sigmas / get_crash_schedule /
alpha_sigma_to_t / sample — reference DiffusionDVAE.py:36-95; the step_list
variant sample_manual — StackedAELatentDiffusionCond.py:71-115; the img2img
partial-noise `resample` — :141-173). The Python sampling loop becomes one
`lax.scan`, so a 35-250 step decode is a single XLA program.

`model_fn(x, t, *cond)` is any callable (a bound flax apply); eta>0 draws
per-step noise from a fold-in of the provided key, giving reproducible
trajectories under jit.
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def get_alphas_sigmas(t: jnp.ndarray):
    """Scaling factors for signal (alpha) and noise (sigma) at timestep t
    (reference DiffusionDVAE.py:36-39)."""
    return jnp.cos(t * math.pi / 2), jnp.sin(t * math.pi / 2)


def alpha_sigma_to_t(alpha, sigma):
    """Inverse of get_alphas_sigmas (reference DiffusionDVAE.py:48-51)."""
    return jnp.arctan2(sigma, alpha) / math.pi * 2


def get_crash_schedule(t: jnp.ndarray):
    """The 'crash' schedule warp (reference DiffusionDVAE.py:42-45)."""
    sigma = jnp.sin(t * math.pi / 2) ** 2
    alpha = (1 - sigma**2) ** 0.5
    return alpha_sigma_to_t(alpha, sigma)


def _ddim_scan(model_fn: Callable, x: jnp.ndarray, t_steps: jnp.ndarray,
               eta: float, key: Optional[jax.Array], extra_args: dict,
               t_of_idx: Optional[Callable] = None,
               aux_mode: bool = False):
    """Shared denoise loop for sample/sample_manual. t_steps: (S,)
    descending. When `t_of_idx(idx) -> t` is given, the schedule is
    recomputed arithmetically per step instead of gathered from the table:
    dynamic-slice reads of loop-invariant tables measurably degrade XLA's
    loop-body schedule on TPU (~80 ms/step on the decode UNet), while a
    few scalar cos/sin are free.

    `aux_mode`: model_fn is `(x, t, aux, **extra) -> (v, aux)` — the
    turbo amax-carry contract (aux = per-site activation amaxes; step k
    quantises with step k-1's grids). Step 0 is unrolled outside the loop
    with aux=None (the model falls back to same-step quantize_act and
    emits the first aux), so the loop body has a single uniform jaxpr."""
    steps = t_steps.shape[0]
    ts_ones = jnp.ones((x.shape[0],), x.dtype)
    if key is None:
        key = jax.random.PRNGKey(0)
    if t_of_idx is None:
        def t_of_idx(idx):
            return t_steps[idx]

    def update(idx, x, v):
        t_i = t_of_idx(idx)
        alpha_i, sigma_i = get_alphas_sigmas(t_i)
        t_n = t_of_idx(jnp.minimum(idx + 1, steps - 1))
        alpha_n, sigma_n = get_alphas_sigmas(t_n)
        v = v.astype(jnp.float32)
        xf = x.astype(jnp.float32)
        pred = xf * alpha_i - v * sigma_i
        eps = xf * sigma_i + v * alpha_i

        if eta:
            ddim_sigma = eta * jnp.sqrt(sigma_n ** 2 / jnp.maximum(sigma_i ** 2, 1e-20)) * \
                jnp.sqrt(jnp.maximum(1 - alpha_i ** 2 / jnp.maximum(alpha_n ** 2, 1e-20), 0.0))
            adjusted_sigma = jnp.sqrt(jnp.maximum(sigma_n ** 2 - ddim_sigma ** 2, 0.0))
            noise = jax.random.normal(jax.random.fold_in(key, idx), x.shape, jnp.float32)
            x_next = pred * alpha_n + eps * adjusted_sigma + noise * ddim_sigma
        else:
            x_next = pred * alpha_n + eps * sigma_n

        is_last = idx == steps - 1
        return jnp.where(is_last, pred, x_next).astype(x.dtype)

    def t_at(idx):
        return ts_ones * t_of_idx(idx).astype(x.dtype)

    if not aux_mode:
        def body(idx, x):
            v = model_fn(x, t_at(idx), **extra_args)
            return update(idx, x, v)

        return jax.lax.fori_loop(0, steps, body, x)

    idx0 = jnp.asarray(0)
    v, aux = model_fn(x, t_at(idx0), None, **extra_args)
    x = update(idx0, x, v)
    if steps == 1:
        return x

    def body_aux(idx, carry):
        x, aux = carry
        v, aux = model_fn(x, t_at(idx), aux, **extra_args)
        return update(idx, x, v), aux

    x, _ = jax.lax.fori_loop(1, steps, body_aux, (x, aux))
    return x


def sample(model_fn: Callable, x: jnp.ndarray, steps: int, eta: float, logits,
           key: Optional[jax.Array] = None, aux_mode: bool = False,
           **extra_args) -> jnp.ndarray:
    """Draw samples from noise x with the crash schedule (reference
    DiffusionDVAE.py:54-95). `logits` is the conditioning (kept positional
    for reference call-site parity: sample(model, noise, steps, 0, reps)).
    `aux_mode`: see _ddim_scan (turbo amax-carry model contract)."""
    t = jnp.linspace(1.0, 0.0, steps + 1)[:-1]
    t = get_crash_schedule(t)
    if logits is not None:
        extra_args = dict(extra_args, cond=logits)

    def t_of_idx(idx):
        # linspace(1,0,steps+1)[idx] == 1 - idx/steps, then crash-warped —
        # identical values to the table, computed as scalars per step
        return get_crash_schedule(1.0 - idx.astype(jnp.float32) / steps)

    return _ddim_scan(model_fn, x, t, eta, key, extra_args,
                      t_of_idx=t_of_idx, aux_mode=aux_mode)


def sample_manual(model_fn: Callable, x: jnp.ndarray, steps: int, eta: float,
                  step_list: Optional[jnp.ndarray] = None,
                  key: Optional[jax.Array] = None, **extra_args) -> jnp.ndarray:
    """Linear (or caller-provided) schedule variant (reference
    StackedAELatentDiffusionCond.py:71-115)."""
    if step_list is None:
        t = jnp.linspace(1.0, 0.0, steps + 1)[:-1]
    else:
        t = step_list
    return _ddim_scan(model_fn, x, t, eta, key, extra_args)


def resample_diffusion(model_fn: Callable, audio_latents: jnp.ndarray,
                       steps: int = 100, eta: float = 0.0,
                       noise_level: float = 1.0,
                       key: Optional[jax.Array] = None,
                       **extra_args) -> jnp.ndarray:
    """img2img-style partial-noise init ("resample", reference
    StackedAELatentDiffusionCond.py:141-173): noise the input latents to
    `noise_level`, then run the tail of the linear schedule."""
    while audio_latents.ndim < 3:
        audio_latents = audio_latents[None]
    if key is None:
        key = jax.random.PRNGKey(0)
    # schedule is host-side: steps/noise_level are static config, so the
    # truncated step list has a static length (jit-compatible)
    import numpy as np

    t = np.linspace(0.0, 1.0, steps + 1)
    step_list = jnp.asarray(t[t < noise_level], jnp.float32)
    if step_list.shape[0] == 0:
        # noise_level <= 0 (e.g. init_strength >= 1.0 upstream): the
        # schedule truncates to NOTHING — no noising, no denoising; the
        # input latents pass through (was: IndexError on step_list[-1])
        return audio_latents
    alpha, sigma = get_alphas_sigmas(step_list[-1])
    noise = jax.random.normal(key, audio_latents.shape, audio_latents.dtype)
    noised = audio_latents * alpha + noise * sigma
    tail = step_list[::-1][:-1]
    if tail.shape[0] == 0:
        # few steps x low noise_level can truncate the schedule to nothing
        # (e.g. steps=2, noise_level=0.5): zero denoising evaluations —
        # the partially-noised latents ARE the result (was: IndexError
        # from a fori_loop over a length-0 schedule)
        return noised
    return sample_manual(model_fn, noised, steps, eta,
                         step_list=tail,
                         key=jax.random.fold_in(key, 1), **extra_args)
