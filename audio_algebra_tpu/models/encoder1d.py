"""Encoder1d — the stage-2 latent encoder of the stacked diffusion AE.

Rebuilds the capability of archinet's audio_encoders_pytorch.Encoder1d as
configured by the reference: in 32 -> out 32, channels 128, multipliers
[1,2,4,8,8], factors [2,2,2,2], num_blocks [8,8,8,8] => /16 downsample
(reference StackedAELatentDiffusionCond.py:191-198). Standard
conv-groupnorm-silu ResNet stages with strided downsampling.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import Conv1d


class _ResnetBlock1d(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=8)(x)
        h = nn.silu(h)
        h = Conv1d(self.features, kernel_size=3)(h)
        h = nn.GroupNorm(num_groups=8)(h)
        h = nn.silu(h)
        h = Conv1d(self.features, kernel_size=3)(h)
        skip = x if x.shape[-1] == self.features else nn.Dense(self.features,
                                                               use_bias=False)(x)
        return skip + h


class Encoder1d(nn.Module):
    in_channels: int = 32
    out_channels: int = 32
    channels: int = 128
    multipliers: Sequence[int] = (1, 2, 4, 8, 8)
    factors: Sequence[int] = (2, 2, 2, 2)
    num_blocks: Sequence[int] = (8, 8, 8, 8)

    @nn.compact
    def __call__(self, x):
        """(B, in_channels, T) -> (B, out_channels, T / prod(factors))."""
        # explicit forward-order names (l000, l001, ...): converters pair
        # tensors by natural-sort order, which must equal forward order
        h = jnp.swapaxes(x, -1, -2)
        idx = 0
        h = Conv1d(self.channels * self.multipliers[0], kernel_size=7,
                   name=f"l{idx:03d}")(h)
        idx += 1
        for i, (factor, blocks) in enumerate(zip(self.factors, self.num_blocks)):
            feats = self.channels * self.multipliers[i]
            for _ in range(blocks):
                h = _ResnetBlock1d(feats, name=f"l{idx:03d}")(h)
                idx += 1
            h = Conv1d(self.channels * self.multipliers[i + 1],
                       kernel_size=2 * factor, stride=factor,
                       name=f"l{idx:03d}")(h)
            idx += 1
        h = nn.GroupNorm(num_groups=8, name=f"l{idx:03d}")(h)
        h = nn.silu(h)
        h = Conv1d(self.out_channels, kernel_size=3, name=f"l{idx + 1:03d}")(h)
        return jnp.swapaxes(h, -1, -2)
