"""DiffusionDVAE — SoundStreamXL encoder + v-diffusion UNet decoder.

Rebuild of the reference's frozen DVAE (reference DiffusionDVAE.py:98-160):
capacity 32, c_mults [2,4,8,16,32], strides [4,4,2,2,2] => /128 downsample,
latent_dim 64; decoder DiffusionAttnUnet1D(io 2, cond 64, 4 attn layers,
c_mults [256,256]+[512]*12); optional Memcodes quantizer; embeddings are
tanh-bounded (reference given_models.py:331).

In the reference, EMA copies are deepcopied torch modules; here the module
defines architecture only and EMA lives as a second parameter pytree managed
by the wrapper/trainer (see models.ema). `encode_it`/`decode_it` parity
helpers live on the DVAEWrapper (given_models.py).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .soundstream import SoundStreamXLEncoder
from .unet1d import DiffusionAttnUnet1D
from .memcodes import Memcodes, ResidualMemcodes
from ..ops.pqmf import PQMF


class DiffusionDVAE(nn.Module):
    latent_dim: int = 64
    io_channels: int = 2
    pqmf_bands: int = 1
    num_quantizers: int = 0
    num_heads: int = 8
    codebook_size: int = 1024
    capacity: int = 32
    c_mults: Sequence[int] = (2, 4, 8, 16, 32)
    strides: Sequence[int] = (4, 4, 2, 2, 2)
    n_attn_layers: int = 4
    diffusion_c_mults: Sequence[int] = tuple([256, 256] + [512] * 12)

    def setup(self):
        self.encoder = SoundStreamXLEncoder(
            in_channels=self.io_channels * self.pqmf_bands,
            capacity=self.capacity, latent_dim=self.latent_dim,
            c_mults=self.c_mults, strides=self.strides)
        self.diffusion = DiffusionAttnUnet1D(
            io_channels=self.io_channels, cond_dim=self.latent_dim,
            pqmf_bands=self.pqmf_bands, n_attn_layers=self.n_attn_layers,
            c_mults=self.diffusion_c_mults)
        if self.num_quantizers > 1:
            self.quantizer = ResidualMemcodes(
                dim=self.latent_dim, heads=self.num_heads,
                num_codes=self.codebook_size, num_quantizers=self.num_quantizers)
        elif self.num_quantizers == 1:
            self.quantizer = Memcodes(
                dim=self.latent_dim, heads=self.num_heads,
                num_codes=self.codebook_size)
        if self.pqmf_bands > 1:
            self.pqmf = PQMF(self.pqmf_bands, 70)

    @property
    def downsampling_ratio(self) -> int:
        import math
        return int(math.prod(self.strides))

    def encode(self, audio: jnp.ndarray) -> jnp.ndarray:
        """(B, C, T) -> raw encoder latents (B, latent_dim, T/128)."""
        x = self.pqmf.analysis(audio) if self.pqmf_bands > 1 else audio
        return self.encoder(x)

    def encode_it(self, audio: jnp.ndarray) -> jnp.ndarray:
        """Reference encode_it semantics (given_models.py:313-332 /
        aa_mixer.py:175-195): pqmf -> encoder -> optional quantize -> tanh."""
        emb = self.encode(audio)
        if self.num_quantizers > 0:
            emb = jnp.swapaxes(emb, 1, 2)          # (b, n, d) for Memcodes
            emb, _ = self.quantizer(emb)
            emb = jnp.swapaxes(emb, 1, 2)
        return jnp.tanh(emb)

    def decode_v(self, x: jnp.ndarray, t: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        """One UNet forward: predicted velocity (the sampler's model_fn)."""
        return self.diffusion(x, t, cond)

    def decode_v_aux(self, x: jnp.ndarray, t: jnp.ndarray, cond: jnp.ndarray,
                     q_aux=None):
        """decode_v in the turbo amax-carry contract: (v, q_aux_out) —
        q_aux is the previous sampler step's per-site amax tree (None on
        the unrolled first step); see DiffusionAttnUnet1D.__call__."""
        return self.diffusion(x, t, cond, q_aux=q_aux, collect_q_aux=True)

    def __call__(self, audio: jnp.ndarray, t: jnp.ndarray):
        """Training-style forward: encode then predict v for noised audio at t.
        (Used for parameter init; the real train/demo paths drive encode_it /
        decode_v directly.)"""
        emb = self.encode_it(audio)
        return self.decode_v(audio, t, emb)
