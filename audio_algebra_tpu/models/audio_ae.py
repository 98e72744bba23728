"""AudioAutoencoder — the first-stage waveform AE under the stacked models.

Rebuilds the capability of zqevans' autoencoders.models.AudioAutoencoder as
configured by the reference: capacity 64, c_mults [2,4,8,16,32], strides
[2,2,2,2,2], latent_dim 32 => downsampling_ratio 32 (reference
given_models.py:373, StackedAELatentDiffusionCond.py:215-217). encode tanh-
bounds the latents; decode mirrors with transposed convs.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .soundstream import SoundStreamXLEncoder, SoundStreamXLDecoder


class AudioAutoencoder(nn.Module):
    capacity: int = 64
    c_mults: Sequence[int] = (2, 4, 8, 16, 32)
    strides: Sequence[int] = (2, 2, 2, 2, 2)
    latent_dim: int = 32
    io_channels: int = 2

    @property
    def downsampling_ratio(self) -> int:
        return int(math.prod(self.strides))

    def setup(self):
        self.encoder = SoundStreamXLEncoder(
            in_channels=self.io_channels, capacity=self.capacity,
            latent_dim=self.latent_dim, c_mults=self.c_mults, strides=self.strides)
        self.decoder = SoundStreamXLDecoder(
            out_channels=self.io_channels, capacity=self.capacity,
            latent_dim=self.latent_dim, c_mults=self.c_mults, strides=self.strides)

    def encode(self, audio: jnp.ndarray) -> jnp.ndarray:
        """(B, C, T) -> tanh-bounded latents (B, latent_dim, T/ratio)."""
        return jnp.tanh(self.encoder(audio))

    def decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        """(B, latent_dim, T') -> (B, C, T' * ratio)."""
        return self.decoder(latents)

    def __call__(self, audio: jnp.ndarray):
        z = self.encode(audio)
        return z, self.decode(z)
