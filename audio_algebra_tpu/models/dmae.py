"""DiffusionAE1d — mel-encoder diffusion autoencoder (DMAE capability).

Rebuilds the capability of archinet's DiffusionAE+MelE1d as wrapped by the
reference DMAE1d (reference given_models.py:438-508): a mel-spectrogram
encoder tower producing 32-d tanh latents at /1024 audio rate
(MelE1d: 80 mels @44.1k, TanhBottleneck) and a diffusion decoder conditioned
on those latents (the reference injects latents at UNet depth 4; here the
latents condition a DiffusionAttnUnet1D via the standard upsample-concat
path — same information flow, one conditioning mechanism for the repo).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.mel import melspectrogram
from .blocks import Conv1d
from .encoder1d import _ResnetBlock1d
from .unet1d import DiffusionAttnUnet1D


class MelEncoder1d(nn.Module):
    """(B, 2, T) audio -> (B, latent_dim, T/downsample) tanh latents."""
    latent_dim: int = 32
    n_mels: int = 80
    sample_rate: int = 44100
    n_fft: int = 1024
    hop: int = 512
    extra_downsample: int = 2     # conv stride after the mel hop
    channels: int = 256
    num_blocks: int = 4

    @nn.compact
    def __call__(self, audio):
        mel = melspectrogram(audio, self.sample_rate, self.n_fft, self.hop,
                             n_mels=self.n_mels)            # (B, C, mel, F)
        logmel = jnp.log(mel + 1e-5)
        b = logmel.shape[0]
        x = logmel.reshape(b, -1, logmel.shape[-1])          # stack channelsxmel
        x = jnp.swapaxes(x, -1, -2)                          # (B, F, C*mel)
        x = Conv1d(self.channels, kernel_size=3)(x)
        for _ in range(self.num_blocks):
            x = _ResnetBlock1d(self.channels)(x)
        x = Conv1d(self.channels, kernel_size=2 * self.extra_downsample,
                   stride=self.extra_downsample)(x)
        for _ in range(self.num_blocks):
            x = _ResnetBlock1d(self.channels)(x)
        x = nn.GroupNorm(num_groups=8)(x)
        x = nn.silu(x)
        x = Conv1d(self.latent_dim, kernel_size=3)(x)
        return jnp.tanh(jnp.swapaxes(x, -1, -2))


class DiffusionAE1d(nn.Module):
    latent_dim: int = 32
    n_mels: int = 80
    sample_rate: int = 44100
    downsample: int = 1024        # audio samples per latent frame
    unet_c_mults: Sequence[int] = (128, 128, 256, 256, 512)
    n_attn_layers: int = 2

    def setup(self):
        hop = self.downsample // 2
        self.encoder = MelEncoder1d(
            latent_dim=self.latent_dim, n_mels=self.n_mels,
            sample_rate=self.sample_rate, hop=hop, extra_downsample=2)
        self.unet = DiffusionAttnUnet1D(
            io_channels=2, cond_dim=self.latent_dim,
            n_attn_layers=self.n_attn_layers,
            c_mults=tuple(self.unet_c_mults))

    def encode(self, audio):
        # trim mel frames so latent length == T // downsample (static shapes)
        z = self.encoder(audio)
        t_lat = audio.shape[-1] // self.downsample
        return z[..., :t_lat]

    def decode_v(self, x, t, cond):
        return self.unet(x, t, cond)

    def __call__(self, audio, t):
        z = self.encode(audio)
        return self.decode_v(audio, t, z)
