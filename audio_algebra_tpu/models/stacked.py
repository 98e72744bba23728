"""Stacked latent diffusion models (the MIRAGE generative stack).

Rebuilds the reference's two stacked models:

* LatentAudioDiffusionAutoencoder (reference
  StackedAELatentDiffusionCond.py:177-255): stage-2 AE over stage-1
  AudioAutoencoder latents — Encoder1d (32->32, /16) + DiffusionAttnUnet1D
  (io 32, cond 32, depth 10, c_mults [512]*10, no attention). encode =
  AE.encode -> latent_encoder -> tanh; decode = noise -> cond diffusion ->
  clamp -> AE.decode.

* StackedAELatentDiffusionCond (reference :259-397): CLAP-conditioned
  UNetCFG1d over the 32-d stage-2 latents (songs config), v-objective
  training with Sobol-free uniform t, 0.1 CFG dropout; EMA handled as a
  parameter pytree by the trainer (models.ema.EMASchedule matches the
  reference's beta 0.9999 / power 3/4).

Sampling loops live in samplers/ (lax.scan); these modules expose the pure
model functions the samplers close over.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .audio_ae import AudioAutoencoder
from .encoder1d import Encoder1d
from .unet1d import DiffusionAttnUnet1D
from .unet_cfg1d import UNetCFG1d


class LatentAudioDiffusionAutoencoder(nn.Module):
    latent_dim: int = 32                 # stage-1 AE latent dim
    second_stage_latent_dim: int = 32
    factors: Sequence[int] = (2, 2, 2, 2)
    ae_capacity: int = 64
    ae_c_mults: Sequence[int] = (2, 4, 8, 16, 32)
    ae_strides: Sequence[int] = (2, 2, 2, 2, 2)
    latent_channels: int = 128
    latent_multipliers: Sequence[int] = (1, 2, 4, 8, 8)
    latent_num_blocks: Sequence[int] = (8, 8, 8, 8)
    diffusion_c_mults: Sequence[int] = tuple([512] * 10)
    diffusion_depth: int = 10

    def setup(self):
        self.autoencoder = AudioAutoencoder(
            capacity=self.ae_capacity, c_mults=self.ae_c_mults,
            strides=self.ae_strides, latent_dim=self.latent_dim)
        self.latent_encoder = Encoder1d(
            in_channels=self.latent_dim,
            out_channels=self.second_stage_latent_dim,
            channels=self.latent_channels, multipliers=tuple(self.latent_multipliers),
            factors=tuple(self.factors), num_blocks=tuple(self.latent_num_blocks))
        self.diffusion = DiffusionAttnUnet1D(
            io_channels=self.latent_dim, cond_dim=self.second_stage_latent_dim,
            n_attn_layers=0, c_mults=tuple(self.diffusion_c_mults),
            depth=self.diffusion_depth)

    @property
    def latent_downsampling_ratio(self) -> int:
        import math
        return int(math.prod(self.factors))

    @property
    def downsampling_ratio(self) -> int:
        import math
        return int(math.prod(self.ae_strides)) * self.latent_downsampling_ratio

    def encode(self, reals: jnp.ndarray) -> jnp.ndarray:
        """(B, 2, T) -> tanh-bounded stage-2 latents
        (B, 32, T/downsampling_ratio) — reference :221-227."""
        first = self.autoencoder.encode(reals)
        second = self.latent_encoder(first)
        return jnp.tanh(second)

    def diffusion_v(self, x, t, cond):
        """Stage-1-latent v prediction (sampler model_fn, reference :232)."""
        return self.diffusion(x, t, cond)

    def diffusion_v_aux(self, x, t, cond, q_aux=None):
        """diffusion_v in the turbo amax-carry contract: (v, q_aux_out) —
        the sampler threads the per-site amax tree across steps (see
        DiffusionAttnUnet1D.__call__)."""
        return self.diffusion(x, t, cond, q_aux=q_aux, collect_q_aux=True)

    def decode_first_stage(self, first_stage_latents: jnp.ndarray) -> jnp.ndarray:
        """AE decode of (clamped) stage-1 latents -> audio (reference :237)."""
        return self.autoencoder.decode(first_stage_latents)

    def __call__(self, reals: jnp.ndarray, t: jnp.ndarray):
        """Init-friendly forward touching every submodule (incl. the AE
        decoder, so all params exist after .init)."""
        latents = self.encode(reals)
        first = self.autoencoder.encode(reals)
        v = self.diffusion_v(first, t, latents)
        recon = self.decode_first_stage(first)
        return v, recon


class StackedAELatentDiffusionCond(nn.Module):
    """UNetCFG1d over stage-2 latents with 512-d context embeddings
    (reference :259-331). The CLAP embedder is external (models.clap /
    given_models.CLAPDAE); this module consumes its (B, 1, 512) output."""
    latent_dim: int = 32
    embedding_features: int = 512
    embedding_max_len: int = 1
    channels: int = 256
    multipliers: Sequence[int] = (2, 3, 4, 4, 4, 4)
    factors: Sequence[int] = (1, 2, 2, 4, 4)
    num_blocks: Sequence[int] = (3, 3, 3, 3, 3)
    attentions: Sequence[int] = (0, 0, 2, 2, 2, 2)
    resnet_groups: int = 8
    attention_heads: int = 16
    attention_features: int = 64
    attention_multiplier: int = 4
    attention_rel_pos_max_distance: int = 2048
    attention_rel_pos_num_buckets: int = 256

    def setup(self):
        self.diffusion = UNetCFG1d(
            in_channels=self.latent_dim,
            context_embedding_features=self.embedding_features,
            context_embedding_max_length=self.embedding_max_len,
            channels=self.channels,
            resnet_groups=self.resnet_groups,
            multipliers=tuple(self.multipliers),
            factors=tuple(self.factors),
            num_blocks=tuple(self.num_blocks),
            attentions=tuple(self.attentions),
            attention_heads=self.attention_heads,
            attention_features=self.attention_features,
            attention_multiplier=self.attention_multiplier,
            attention_rel_pos_max_distance=self
            .attention_rel_pos_max_distance,
            attention_rel_pos_num_buckets=self
            .attention_rel_pos_num_buckets,
            use_skip_scale=True, use_context_time=True)

    def __call__(self, x, t, embedding=None, embedding_mask_proba: float = 0.0,
                 embedding_scale: float = 1.0, rel_biases=None,
                 fold_blocks: int = 0):
        return self.diffusion(x, t, embedding=embedding,
                              embedding_mask_proba=embedding_mask_proba,
                              embedding_scale=embedding_scale,
                              rel_biases=rel_biases, fold_blocks=fold_blocks)


def v_objective_loss(model_apply, params, latents, embeddings, t, noise,
                     rng, embedding_mask_proba: float = 0.1):
    """The reference training_step math (StackedAELatentDiffusionCond.py:
    367-384): noised = z*alpha + noise*sigma; target = noise*alpha - z*sigma;
    MSE on predicted v with CFG dropout."""
    from ..samplers.vddim import get_alphas_sigmas

    alphas, sigmas = get_alphas_sigmas(t)
    alphas = alphas[:, None, None]
    sigmas = sigmas[:, None, None]
    noised = latents * alphas + noise * sigmas
    targets = noise * alphas - latents * sigmas
    v = model_apply(params, noised, t, embedding=embeddings,
                    embedding_mask_proba=embedding_mask_proba,
                    rngs={"cfg": rng})
    return jnp.mean(jnp.square(v - targets))
