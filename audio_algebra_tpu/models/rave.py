"""RAVE — compact multiband variational autoencoder (RAVE capability).

Stands in for IRCAM's RAVE as wrapped by the reference RAVEWrapper
(reference given_models.py:511-557). The reference treats RAVE as an
optional external (`got_rave` guard, :19-25) loaded from TorchScript; here
the wrapper is always functional via this JAX implementation of RAVE's
core structure: PQMF multiband decomposition -> strided conv encoder ->
low-rate latents (reparameterised at train, mean at inference) -> mirrored
decoder -> PQMF synthesis. Default /2048 total downsample at 16 bands
matches RAVE v2's latent rate.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pqmf import PQMF
from .blocks import Conv1d


class _ConvBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        h = nn.silu(x)
        h = Conv1d(self.features, kernel_size=2 * self.stride if self.stride > 1 else 3,
                   stride=self.stride)(h)
        return h


class RAVE(nn.Module):
    latent_dim: int = 16
    n_bands: int = 16
    capacity: int = 32
    strides: Sequence[int] = (4, 4, 4, 2)

    def setup(self):
        self.pqmf = PQMF(self.n_bands, 70)
        enc = []
        feats = self.capacity
        for s in self.strides:
            feats *= 2
            enc.append(_ConvBlock(feats, stride=s))
        self.enc_blocks = enc
        self.enc_in = Conv1d(self.capacity, kernel_size=7)
        self.enc_out = Conv1d(2 * self.latent_dim, kernel_size=3)  # mean+scale
        dec = []
        for s in self.strides[::-1]:
            feats //= 2
            dec.append((nn.ConvTranspose(feats, (2 * s,), strides=(s,),
                                         padding="SAME"), s))
        self.dec_blocks = dec
        self.dec_in = Conv1d(feats * 2 ** len(self.strides), kernel_size=3)
        self.dec_out = Conv1d(self.n_bands, kernel_size=7)

    def encode(self, audio, sample: bool = False, key=None):
        """(B, 1, T) mono -> (B, latent_dim, T/(n_bands*prod(strides)))."""
        sub = self.pqmf.analysis(audio)                    # (B, n_bands, T/nb)
        x = jnp.swapaxes(sub, -1, -2)
        x = self.enc_in(x)
        for blk in self.enc_blocks:
            x = blk(x)
        stats = self.enc_out(nn.silu(x))
        mean, scale = jnp.split(stats, 2, axis=-1)
        if sample and key is not None:
            std = nn.softplus(scale) + 1e-4
            mean = mean + std * jax.random.normal(key, mean.shape)
        return jnp.swapaxes(mean, -1, -2)

    def decode(self, z):
        x = jnp.swapaxes(z, -1, -2)
        x = self.dec_in(x)
        for tconv, _s in self.dec_blocks:
            x = tconv(nn.silu(x))
        sub = self.dec_out(nn.silu(x))
        sub = jnp.tanh(sub)
        return self.pqmf.synthesis(jnp.swapaxes(sub, -1, -2))

    def __call__(self, audio):
        z = self.encode(audio)
        return z, self.decode(z)
