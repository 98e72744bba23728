"""SoundStream-XL encoder/decoder (the DVAE's convolutional front-end).

Rebuilds the capability of zqevans' SoundStreamXLEncoder as instantiated by
the reference DVAE: capacity 32, c_mults [2,4,8,16,32], strides [4,4,2,2,2]
=> /128 downsample to latent_dim 64 (reference DiffusionDVAE.py:107-119) and
by the first-stage AudioAutoencoder: capacity 64, strides [2,2,2,2,2] => /32
to latent 32 (reference given_models.py:373).

Architecture: initial conv7 -> per-stage [3 dilated residual units (1,3,9) +
strided down conv] -> final conv3 to latent_dim; ELU activations (SoundStream
paper recipe). Decoder mirrors with transposed convs.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import Conv1d


class ResidualUnit(nn.Module):
    features: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        h = nn.elu(x)
        h = Conv1d(self.features, kernel_size=7, dilation=self.dilation)(h)
        h = nn.elu(h)
        h = Conv1d(self.features, kernel_size=1)(h)
        return x + h


class EncoderBlock(nn.Module):
    features: int      # output channels of this stage
    stride: int

    @nn.compact
    def __call__(self, x):
        # explicit forward-order names: converters pair tensors by natural-
        # sort order, which must equal forward order (auto class names sort
        # Conv1d_* before ResidualUnit_*, crossing the strided conv)
        in_feat = x.shape[-1]
        for j, d in enumerate((1, 3, 9)):
            x = ResidualUnit(in_feat, d, name=f"u{j}")(x)
        x = nn.elu(x)
        return Conv1d(self.features, kernel_size=2 * self.stride,
                      stride=self.stride, name="u3")(x)


class DecoderBlock(nn.Module):
    features: int
    stride: int

    @nn.compact
    def __call__(self, x):
        x = nn.elu(x)
        # transpose_kernel=True == torch conv_transpose1d semantics (flipped
        # (K, Cout, Cin) kernel): real checkpoints pour without resampling
        # artifacts; verified exact vs torch in tests/test_convert_parity.py
        x = nn.ConvTranspose(self.features, (2 * self.stride,), strides=(self.stride,),
                             padding="SAME", transpose_kernel=True, name="u0")(x)
        for j, d in enumerate((1, 3, 9)):
            x = ResidualUnit(self.features, d, name=f"u{j + 1}")(x)
        return x


class SoundStreamXLEncoder(nn.Module):
    """(B, C_in, T) -> (B, latent_dim, T / prod(strides))."""
    in_channels: int = 2
    capacity: int = 32
    latent_dim: int = 64
    c_mults: Sequence[int] = (2, 4, 8, 16, 32)
    strides: Sequence[int] = (4, 4, 2, 2, 2)

    @nn.compact
    def __call__(self, audio):
        x = jnp.swapaxes(audio, -1, -2)                  # -> (B, T, C)
        x = Conv1d(self.capacity, kernel_size=7, name="l000")(x)
        i = 0
        for i, (mult, stride) in enumerate(zip(self.c_mults, self.strides)):
            x = EncoderBlock(self.capacity * mult, stride,
                             name=f"l{i + 1:03d}")(x)
        x = nn.elu(x)
        x = Conv1d(self.latent_dim, kernel_size=3, name=f"l{i + 2:03d}")(x)
        return jnp.swapaxes(x, -1, -2)                   # -> (B, latent, T')


class SoundStreamXLDecoder(nn.Module):
    """(B, latent_dim, T') -> (B, out_channels, T' * prod(strides))."""
    out_channels: int = 2
    capacity: int = 32
    latent_dim: int = 64
    c_mults: Sequence[int] = (2, 4, 8, 16, 32)
    strides: Sequence[int] = (4, 4, 2, 2, 2)

    @nn.compact
    def __call__(self, latents):
        x = jnp.swapaxes(latents, -1, -2)
        x = Conv1d(self.capacity * self.c_mults[-1], kernel_size=7,
                   name="l000")(x)
        i = 0
        for i, (mult_next, stride) in enumerate(zip(
            list(self.c_mults[-2::-1]) + [1], self.strides[::-1]
        )):
            x = DecoderBlock(self.capacity * mult_next, stride,
                             name=f"l{i + 1:03d}")(x)
        x = nn.elu(x)
        x = Conv1d(self.out_channels, kernel_size=7, name=f"l{i + 2:03d}")(x)
        return jnp.swapaxes(x, -1, -2)
