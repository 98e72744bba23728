"""CLAP — contrastive language-audio embedder (inference-scoped).

Rebuilds the capability surface of laion_clap.CLAP_Module as the reference
uses it (reference given_models.py:573-605, StackedAELatentDiffusionCond.py:
268): `get_text_embedding([texts]) -> (N, 512)` and
`get_audio_embedding_from_data((B, T) mono @48k) -> (B, 512)`, both
L2-normalised, consumed as (B, 1, 512) conditioning.

Architecture (HTSAT-capability, TPU-shaped):
  * audio tower: 64-mel log spectrogram -> conv patch embed (4x4 patches
    over (mel, time)) -> pre-norm transformer -> mean-pool -> MLP proj to
    512. This is the transformer-over-mel-patches recipe of HTSAT without
    the Swin window bookkeeping (full attention over <=1k patches is cheap
    on the MXU and strictly more expressive).
  * text tower: byte-level embedding (vocab 256 + specials; replaces the
    RoBERTa BPE tokenizer, which needs external vocab files this
    environment cannot fetch) -> transformer -> CLS pool -> proj to 512.

Real laion_clap checkpoints can be mapped onto the projection-interface via
checkpoint.py's converter hooks when weights are available; random-weight
operation mirrors the reference's "Going with random weights" fallback
(reference given_models.py:354).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.mel import melspectrogram


class TransformerEncoderBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm()(x)
        h = nn.MultiHeadDotProductAttention(num_heads=self.heads)(h, h)
        x = x + h
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.dim * self.mlp_ratio)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim)(h)
        return x + h


class AudioTower(nn.Module):
    embed_dim: int = 512
    width: int = 256
    depth: int = 6
    heads: int = 8
    n_mels: int = 64
    sample_rate: int = 48000
    n_fft: int = 1024
    hop: int = 480          # 10 ms at 48k
    patch: int = 4
    max_patches: int = 8192  # supports arbitrary-length audio (pos slice)

    @nn.compact
    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        """(B, T) mono float -> (B, embed_dim) L2-normalised."""
        mel = melspectrogram(audio, self.sample_rate, self.n_fft, self.hop,
                             n_mels=self.n_mels)                  # (B, mel, F)
        logmel = jnp.log(mel + 1e-5)
        b, m, f = logmel.shape
        f_trim = (f // self.patch) * self.patch
        x = logmel[:, :, :f_trim].reshape(b, m // self.patch, self.patch,
                                          f_trim // self.patch, self.patch)
        x = x.transpose(0, 1, 3, 2, 4).reshape(
            b, (m // self.patch) * (f_trim // self.patch), self.patch * self.patch)
        x = nn.Dense(self.width, name="patch_embed")(x)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, self.max_patches, self.width))
        x = x + pos[:, : x.shape[1]]
        for i in range(self.depth):
            x = TransformerEncoderBlock(self.width, self.heads, name=f"block{i}")(x)
        x = nn.LayerNorm()(x).mean(axis=1)
        x = nn.Dense(self.embed_dim, name="proj1")(x)
        x = nn.gelu(x)
        x = nn.Dense(self.embed_dim, name="proj2")(x)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)


class TextTower(nn.Module):
    embed_dim: int = 512
    width: int = 256
    depth: int = 4
    heads: int = 8
    vocab: int = 260        # 256 bytes + BOS/EOS/PAD/UNK
    max_len: int = 128

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """(B, L) int tokens -> (B, embed_dim) L2-normalised."""
        x = nn.Embed(self.vocab, self.width, name="tok_embed")(tokens)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, self.max_len, self.width))
        x = x + pos[:, : x.shape[1]]
        for i in range(self.depth):
            x = TransformerEncoderBlock(self.width, self.heads, name=f"block{i}")(x)
        x = nn.LayerNorm()(x)[:, 0]     # BOS/CLS pool
        x = nn.Dense(self.embed_dim, name="proj")(x)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)


def tokenize_bytes(texts: Sequence[str], max_len: int = 128) -> np.ndarray:
    """Byte-level tokenizer: [BOS=256] bytes... [EOS=257], pad 258."""
    out = np.full((len(texts), max_len), 258, dtype=np.int32)
    for i, t in enumerate(texts):
        ids = [256] + list(t.encode("utf-8")[: max_len - 2]) + [257]
        out[i, : len(ids)] = ids
    return out


class CLAPModule:
    """Host-side bundle exposing the laion_clap call surface.

    `enable_fusion`/`amodel` accepted for signature parity with
    laion_clap.CLAP_Module (reference given_models.py:573).
    """

    def __init__(self, enable_fusion: bool = True, amodel: str = "HTSAT-base",
                 embed_dim: int = 512, audio_cfg: Optional[dict] = None,
                 text_cfg: Optional[dict] = None, seed: int = 0, **kwargs):
        self.enable_fusion = enable_fusion
        self.amodel = amodel
        self.embed_dim = embed_dim
        self.audio_tower = AudioTower(embed_dim=embed_dim, **(audio_cfg or {}))
        self.text_tower = TextTower(embed_dim=embed_dim, **(text_cfg or {}))
        self._key = jax.random.PRNGKey(seed)
        self.audio_params = None
        self.text_params = None
        self._audio_jit = None
        self._text_jit = None

    def _ensure_init(self, audio_len: int = 48000):
        if self.audio_params is None:
            k1, k2, self._key = jax.random.split(self._key, 3)
            self.audio_params = self.audio_tower.init(k1, jnp.zeros((1, audio_len)))
            self.text_params = self.text_tower.init(
                k2, jnp.zeros((1, 8), jnp.int32))
            self._audio_jit = jax.jit(self.audio_tower.apply)
            self._text_jit = jax.jit(self.text_tower.apply)

    def load_ckpt(self, ckpt=None, model_id=None, verbose: bool = False):
        """laion_clap signature parity (reference given_models.py:682-688).
        Pours a torch laion_clap state dict into the towers: projection
        MLPs map explicitly (audio_projection.{0,2} -> proj1/proj2,
        text_projection.2 -> proj) and branch tensors pour by shape where
        the widths align; Swin-windowed HTSAT interior tensors that cannot
        map onto the full-attention rebuild are counted and reported, never
        silently dropped."""
        if ckpt is None:
            if verbose:
                print("CLAPModule: no checkpoint provided, keeping weights")
            return
        from ..checkpoint import load_torch_checkpoint
        from ..convert import convert_clap_state_dict

        try:
            sd = load_torch_checkpoint(ckpt)
            if verbose:
                print(f"CLAPModule: loaded {len(sd)} tensors from {ckpt}")
            self._ensure_init()
            self.audio_params, self.text_params, hits, misses = \
                convert_clap_state_dict(sd, self.audio_params, self.text_params)
        except Exception as e:   # mirror reference fallback (given_models.py:354)
            print(f"CLAPModule: {e}. Going with random weights")

    def get_audio_embedding_from_data(self, x, use_tensor: bool = True) -> jnp.ndarray:
        """(B, T) mono audio @48k -> (B, 512)."""
        x = jnp.asarray(x)
        if x.ndim == 1:
            x = x[None]
        self._ensure_init(x.shape[-1])
        return self._audio_jit(self.audio_params, x)

    def get_text_embedding(self, texts: Sequence[str], use_tensor: bool = True) -> jnp.ndarray:
        """list[str] -> (N, 512)."""
        self._ensure_init()
        tokens = jnp.asarray(tokenize_bytes(list(texts)))
        return self._text_jit(self.text_params, tokens)
