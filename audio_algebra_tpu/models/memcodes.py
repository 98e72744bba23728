"""Memcodes — multi-head attention-based vector quantizer.

Rebuilds the capability of nwt_pytorch's Memcodes / ResidualMemcodes as the
reference's optional DVAE quantizer (dim=latent_dim, heads, num_codes,
temperature=1 — reference DiffusionDVAE.py:136-150; applied over (b, n, d)
with an einops rearrange at given_models.py:326-329).

Quantization: split features into heads; score each head's vector against a
learned per-head codebook by scaled dot product; hard-select the argmax code
with a straight-through softmax gradient. Entirely static-shape — argmax +
one-hot matmul, no gather loops.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class Memcodes(nn.Module):
    dim: int = 64
    heads: int = 8
    num_codes: int = 1024
    temperature: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """(B, N, dim) -> (quantized (B, N, dim), indices (B, N, heads))."""
        b, n, d = x.shape
        dh = d // self.heads
        codes = self.param("codes", nn.initializers.normal(1.0),
                           (self.heads, self.num_codes, dh))
        xh = x.reshape(b, n, self.heads, dh)
        logits = jnp.einsum("bnhd,hcd->bnhc", xh, codes,
                            preferred_element_type=jnp.float32)
        logits = logits / (math.sqrt(dh) * self.temperature)
        indices = jnp.argmax(logits, axis=-1)
        hard = jax.nn.one_hot(indices, self.num_codes, dtype=logits.dtype)
        soft = jax.nn.softmax(logits, axis=-1)
        onehot = soft + jax.lax.stop_gradient(hard - soft)   # straight-through
        quantized = jnp.einsum("bnhc,hcd->bnhd", onehot, codes).reshape(b, n, d)
        return quantized.astype(x.dtype), indices


class ResidualMemcodes(nn.Module):
    """Stacked Memcodes quantizing successive residuals (num_quantizers > 1,
    reference DiffusionDVAE.py:136)."""
    dim: int = 64
    heads: int = 8
    num_codes: int = 1024
    num_quantizers: int = 2
    temperature: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        out = jnp.zeros_like(x)
        residual = x
        all_indices = []
        for i in range(self.num_quantizers):
            q, idx = Memcodes(self.dim, self.heads, self.num_codes,
                              self.temperature, name=f"quantizer_{i}")(residual)
            out = out + q
            residual = residual - jax.lax.stop_gradient(q)
            all_indices.append(idx)
        return out, jnp.stack(all_indices, axis=-1)
