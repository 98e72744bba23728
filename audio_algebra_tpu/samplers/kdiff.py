"""k-diffusion sampling path: VDenoiser + polyexponential sigmas + DPM++(2M).

Rebuilds the capability of the reference's k-diffusion usage
(`K.external.VDenoiser`, `K.sampling.get_sigmas_polyexponential(steps, 0.11,
50)`, `K.sampling.sample_dpmpp_2m` — reference
StackedAELatentDiffusionCond.py:119-138). The sampler loop is one
`lax.scan`; the first-step special case (no previous denoised estimate) is
folded in with a select instead of a Python branch.
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


class VDenoiser:
    """Wrap a v-objective model as a Karras-style denoiser (sigma_data=1).

    denoised = c_skip*x + c_out*model(c_in*x, t(sigma)); t = atan(sigma)·2/π.
    """

    def __init__(self, model_fn: Callable, sigma_data: float = 1.0):
        self.model_fn = model_fn
        self.sigma_data = sigma_data

    def sigma_to_t(self, sigma):
        return jnp.arctan(sigma / self.sigma_data) / math.pi * 2

    def t_to_sigma(self, t):
        return jnp.tan(t * math.pi / 2) * self.sigma_data

    def __call__(self, x, sigma, **kwargs):
        # coefficients in f32 (sigma spans 0.11..50), applied in x.dtype:
        # a bf16 x must stay bf16 through the whole loop — an f32 promotion
        # here silently ran all 150 inner-stage UNet steps in f32 under
        # model.half() (f32 convs measured ~1/4 the bf16 rate)
        sigma = jnp.asarray(sigma, jnp.float32)
        sd2 = self.sigma_data**2
        total = sigma**2 + sd2
        c_skip = (sd2 / total).astype(x.dtype)
        c_out = (-sigma * self.sigma_data / jnp.sqrt(total)).astype(x.dtype)
        c_in = (1.0 / jnp.sqrt(total)).astype(x.dtype)
        shape = (-1,) + (1,) * (x.ndim - 1)
        v = self.model_fn(x * c_in.reshape(shape),
                          self.sigma_to_t(sigma).astype(x.dtype), **kwargs)
        return x * c_skip.reshape(shape) + v.astype(x.dtype) * c_out.reshape(shape)


def get_sigmas_polyexponential(n: int, sigma_min: float, sigma_max: float,
                               rho: float = 1.0) -> jnp.ndarray:
    """Polyexponential sigma schedule, descending, with trailing 0
    (k-diffusion semantics used at reference StackedAELatentDiffusionCond.py:128)."""
    ramp = np.linspace(1, 0, n) ** rho
    sigmas = np.exp(ramp * (math.log(sigma_max) - math.log(sigma_min))
                    + math.log(sigma_min))
    return jnp.asarray(np.append(sigmas, 0.0), jnp.float32)


def sample_dpmpp_2m(denoiser: Callable, x: jnp.ndarray, sigmas: jnp.ndarray,
                    extra_args: Optional[dict] = None) -> jnp.ndarray:
    """DPM-Solver++(2M) as one lax.scan (k-diffusion sample_dpmpp_2m math)."""
    extra_args = extra_args or {}
    n = sigmas.shape[0] - 1

    def t_fn(sigma):
        return -jnp.log(jnp.maximum(sigma, 1e-20))

    def sigma_fn(t):
        return jnp.exp(-t)

    def body(carry, i):
        x, old_denoised = carry
        denoised = denoiser(x, sigmas[i] * jnp.ones((x.shape[0],),
                                                    jnp.float32),
                            **extra_args)
        # step math in f32; every factor applied to x/denoised casts back
        # so a bf16 x stays bf16 across the scan (see VDenoiser.__call__)
        t, t_next = t_fn(sigmas[i]), t_fn(sigmas[i + 1])
        h = t_next - t
        first = (i == 0) | (sigmas[i + 1] == 0)
        h_last = t - t_fn(sigmas[jnp.maximum(i - 1, 0)])
        r = h_last / h
        ca = (1 + 1 / (2 * r)).astype(x.dtype)
        cb = (1 / (2 * r)).astype(x.dtype)
        denoised_d = jnp.where(first, denoised,
                               ca * denoised - cb * old_denoised)
        x_next = (sigma_fn(t_next) / sigma_fn(t)).astype(x.dtype) * x \
            - jnp.expm1(-h).astype(x.dtype) * denoised_d
        return (x_next, denoised), None

    (x, _), _ = jax.lax.scan(body, (x, jnp.zeros_like(x)), jnp.arange(n))
    return x


def kdiff_sample(model_fn: Callable, latents: jnp.ndarray, steps: int,
                 eta: float = 0.0, sigma_min: float = 0.11,
                 sigma_max: float = 50.0, **extra_args) -> jnp.ndarray:
    """The reference's `sample` wrapper (StackedAELatentDiffusionCond.py:119-138):
    scale unit noise by sigma_max, run DPM++(2M) over polyexponential sigmas,
    clamp to [-1, 1].

    `eta` is accepted for call-signature parity with the reference's
    `sample(model, latents, steps, eta, ...)` and is UNUSED, exactly as
    there: DPM++(2M) is deterministic and k-diffusion's sample_dpmpp_2m
    takes no eta. Pass 0.0 (any other value changes nothing)."""
    if eta:
        import warnings
        warnings.warn("kdiff_sample ignores eta (DPM++(2M) is deterministic; "
                      "matches reference behaviour)", stacklevel=2)
    denoiser = VDenoiser(model_fn)
    sigmas = get_sigmas_polyexponential(steps, sigma_min, sigma_max)
    x = latents * sigmas[0].astype(latents.dtype)   # keep bf16 bf16
    out = sample_dpmpp_2m(denoiser, x, sigmas, extra_args=extra_args)
    return jnp.clip(out, -1.0, 1.0)
