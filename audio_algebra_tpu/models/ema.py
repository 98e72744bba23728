"""EMA as pure pytree maps (replaces torch module deep-copies).

The reference maintains EMA weight copies two ways: diffusion.model's
ema_update(model, model_ema, decay) (reference DiffusionDVAE.py:120,130) and
ema_pytorch's EMA wrapper with a warmup decay schedule beta=0.9999,
power=3/4 (reference StackedAELatentDiffusionCond.py:319-325). In JAX both
are a jnp tree_map over parameter pytrees — they fuse into the update step
under jit, no module copies, no .data mutation.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


def ema_update(params, ema_params, decay: float | jnp.ndarray):
    """ema <- decay * ema + (1-decay) * params, over arbitrary pytrees."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema_params, params)


@dataclass(frozen=True)
class EMASchedule:
    """ema_pytorch-style warmup decay: decay(t) = clip(1 - (1 + t/inv_gamma)
    ^ -power, 0, beta) (reference StackedAELatentDiffusionCond.py:319-325
    uses beta=0.9999, power=3/4)."""
    beta: float = 0.9999
    power: float = 0.75
    inv_gamma: float = 1.0
    update_after_step: int = 1

    def decay(self, step) -> jnp.ndarray:
        t = jnp.maximum(jnp.asarray(step, jnp.float32) - self.update_after_step, 0.0)
        value = 1.0 - (1.0 + t / self.inv_gamma) ** (-self.power)
        return jnp.clip(jnp.where(t <= 0, 0.0, value), 0.0, self.beta)

    def update(self, params, ema_params, step):
        return ema_update(params, ema_params, self.decay(step))
