"""EmbedBlock + AudioAlgebra — the trainable re-embedding map h / h^-1.

Rebuild of the reference's core trainable model (aa_mixer.py:205-267 =
aa_effects.py:51-113): a 4-block MLP encoder and a same-shaped decoder
applied per-timestep over (b, d, n) embeddings, with optional per-block and
global residuals, GELU activations, optional BatchNorm, and a `trivial`
identity mode.

TPU note: the reference transposes (b, d, n) -> (b, n, d) so the feature
axis is last for the Linear layers (aa_mixer.py:254) — here that is also
exactly the MXU-friendly layout, so the transpose is free inside jit.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from flax import linen as nn


class EmbedBlock(nn.Module):
    """Linear -> act -> optional BatchNorm, residual when dims match
    (reference aa_mixer.py:205-221)."""
    out_dims: int
    act: Optional[Callable] = nn.gelu
    resid: bool = True
    use_bn: bool = False

    @nn.compact
    def __call__(self, xin, train: bool = False):
        x = nn.Dense(self.out_dims)(xin)
        if self.act is not None:
            x = self.act(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train, axis=-1)(x)
        return xin + x if (self.resid and xin.shape[-1] == self.out_dims) else x


class _MLP(nn.Module):
    dims: int
    hidden_dims: int
    resid: bool
    use_bn: bool

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = EmbedBlock(self.hidden_dims, resid=self.resid, use_bn=self.use_bn)(x, train)
        x = EmbedBlock(self.hidden_dims, resid=self.resid, use_bn=self.use_bn)(x, train)
        x = EmbedBlock(self.hidden_dims, resid=self.resid, use_bn=self.use_bn)(x, train)
        x = EmbedBlock(self.dims, act=None, resid=self.resid, use_bn=self.use_bn)(x, train)
        return x


class AudioAlgebra(nn.Module):
    """h: y->z and h^-1: z->y over (b, d, n) embeddings
    (reference aa_mixer.py:224-267)."""
    dims: int = 32
    hidden_dims: int = 64
    resid: bool = True
    use_bn: bool = False
    trivial: bool = False

    def setup(self):
        if not self.trivial:
            self.encoder = _MLP(self.dims, self.hidden_dims, self.resid, self.use_bn)
            self.decoder = _MLP(self.dims, self.hidden_dims, self.resid, self.use_bn)

    def encode(self, xin, train: bool = False):
        if self.trivial:
            return xin
        x = jnp.swapaxes(xin, 1, 2)        # (b, n, d): features last
        x = self.encoder(x, train)
        x = jnp.swapaxes(x, 1, 2)
        return x + xin if self.resid else x

    def decode(self, xin, train: bool = False):
        if self.trivial:
            return xin
        x = jnp.swapaxes(xin, 1, 2)
        x = self.decoder(x, train)
        x = jnp.swapaxes(x, 1, 2)
        return x + xin if self.resid else x

    def __call__(self, x, train: bool = False):
        """Returns (encode(x), decode(encode(x))) — reference aa_mixer.py:262-267."""
        xprime = self.encode(x, train)
        xprimeprime = self.decode(xprime, train)
        return xprime, xprimeprime
