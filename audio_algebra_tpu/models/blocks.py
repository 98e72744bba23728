"""Shared neural blocks (channels-last, MXU-shaped).

JAX rebuilds of the dance-diffusion-style building blocks the reference's
vendored models are made of (ResConvBlock / SelfAttention1d / FourierFeatures
— consumed by DiffusionAttnUnet1D, reference DiffusionDVAE.py:122-128).
All tensors inside are (B, T, C): feature axis last = TPU lane axis, so
convs lower to implicit GEMM and norms/activations fuse on the VPU.
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def conv1d(x: jnp.ndarray, kernel: jnp.ndarray, stride: int = 1, dilation: int = 1,
           padding: str | int = "SAME") -> jnp.ndarray:
    """(B, T, Cin) * (K, Cin, Cout) -> (B, T', Cout)."""
    if isinstance(padding, int):
        pad = [(padding, padding)]
    else:
        pad = padding
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride,), padding=pad,
        rhs_dilation=(dilation,), dimension_numbers=("NHC", "HIO", "NHC"))


def conv1d_mm(x: jnp.ndarray, kernel: jnp.ndarray, bias: Optional[jnp.ndarray],
              stride: int = 1, dilation: int = 1) -> jnp.ndarray:
    """SAME-padded 1D conv as shifted matmuls (MXU formulation).

    y[t] = Σ_k x[t·s + k·d − pad] @ W[k]. Avoids the XLA conv op entirely:
    on the axon TPU backend, full-rate small-channel dilated convs took
    minutes to compile (measured 369 s for the SoundStream stage-1 block);
    the equivalent slice+matmul program compiles in seconds and keeps the
    contraction on the 128-lane axis. For small Cin the K taps concatenate
    into ONE matmul with contraction K·Cin; for large Cin (already MXU-
    efficient) taps accumulate to bound memory.
    """
    b, t, c_in = x.shape
    k, _, c_out = kernel.shape
    out_len = -(-t // stride)
    # XLA SAME padding: total = max((out-1)*s + (k-1)*d + 1 - T, 0), low-half first
    pad_total = max((out_len - 1) * stride + (k - 1) * dilation + 1 - t, 0)
    pad_l = pad_total // 2
    xp = jnp.pad(x, ((0, 0), (pad_l, pad_total - pad_l), (0, 0)))

    def tap(i):
        start = i * dilation
        sl = jax.lax.slice(xp, (0, start, 0),
                           (b, start + (out_len - 1) * stride + 1, c_in),
                           (1, stride, 1))
        return sl

    if c_in < 128:
        # small-channel convs: ONE matmul with contraction K*Cin (the XLA
        # conv op at these shapes hit minute-scale compiles on axon)
        stacked = jnp.concatenate([tap(i) for i in range(k)], axis=-1)
        y = jnp.matmul(stacked, kernel.reshape(k * c_in, c_out),
                       preferred_element_type=jnp.float32)
    else:
        # large-channel convs: the XLA conv op compiles fine and measures
        # ~20% faster than shifted matmuls at the UNet's hot shapes
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(stride,), padding="SAME",
            rhs_dilation=(dilation,),
            dimension_numbers=("NHC", "HIO", "NHC")) + \
            (bias.astype(x.dtype) if bias is not None else 0.0)
    y = y.astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


class Conv1d(nn.Module):
    """Channels-last 1D conv (torch-style kernel_size/stride/dilation),
    computed via conv1d_mm. Param layout matches flax nn.Conv ((K, Cin,
    Cout) kernel + (Cout,) bias) so checkpoints stay interchangeable."""
    features: int
    kernel_size: int = 5
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(in_axis=(0, 1), out_axis=2),
            (self.kernel_size, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,)) \
            if self.use_bias else None
        return conv1d_mm(x, kernel.astype(x.dtype), bias, self.stride, self.dilation)


class FourierFeatures(nn.Module):
    """Random Fourier timestep embedding: t (B,) -> (B, out_features).

    The frozen weight matrix is a fixed gaussian draw (std configurable) —
    matching the timestep_embed used in the dance-diffusion UNets the
    reference vendors.
    """
    out_features: int = 16
    std: float = 1.0

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        w = self.param("weight", nn.initializers.normal(stddev=self.std),
                       (self.out_features // 2, 1))
        f = 2.0 * math.pi * t[:, None] * w[None, :, 0]  # (B, out/2)
        return jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1)


class GroupNorm1(nn.Module):
    """GroupNorm(num_groups=1) [+ optional fused GELU], normalising over
    (T, C) per batch element.

    Param-compatible with flax nn.GroupNorm ({'scale','bias'} of shape
    (C,)). At MXU-aligned shapes it dispatches to the Pallas fused kernel
    (ops/pallas/groupnorm.py): XLA's own lowering laid the stats/normalise
    fusions out time-minor while the surrounding convs are channel-minor,
    inserting two full-tensor layout copies around EVERY GroupNorm — 69 ms
    of the 350 ms UNet forward. Other shapes take the plain jnp path.
    """
    fuse_gelu: bool = False

    @nn.compact
    def __call__(self, x, residual=None):
        """With `residual`, returns residual + [gelu](gn(x)) — the block's
        skip-add folded into the same kernel pass."""
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        from ..ops.pallas import groupnorm as pgn
        if pgn.supported(x.shape, x.dtype):
            return pgn.groupnorm1_gelu_btc(x, scale.astype(x.dtype),
                                           bias.astype(x.dtype),
                                           gelu=self.fuse_gelu,
                                           residual=residual)
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True) \
            - jnp.square(mu)
        y = (x32 - mu) * jax.lax.rsqrt(var + 1e-6)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        y = y.astype(x.dtype)
        if self.fuse_gelu:
            y = nn.gelu(y)
        return y if residual is None else residual + y


class ResConvBlock(nn.Module):
    """conv5-GN-GELU-conv5-GN-GELU with 1x1-projected residual.

    is_last drops the final norm/activation (output head). Mirrors the
    capability of the dance-diffusion ResConvBlock used throughout the
    reference's UNets.
    """
    c_mid: int
    c_out: int
    is_last: bool = False

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        skip = x if c_in == self.c_out else nn.Dense(self.c_out, use_bias=False,
                                                     name="skip_proj")(x)
        h = Conv1d(self.c_mid, 5)(x)
        h = GroupNorm1(fuse_gelu=True, name="GroupNorm_0")(h)
        h = Conv1d(self.c_out, 5)(h)
        if self.is_last:
            return skip + h
        return GroupNorm1(fuse_gelu=True, name="GroupNorm_1")(h, residual=skip)


class SelfAttention1d(nn.Module):
    """Pre-norm multi-head self-attention over the time axis with residual.

    Matches the capability of dance-diffusion's SelfAttention1d (n_head =
    channels//32 at the call sites the reference uses). Attention runs in
    f32 accumulation via preferred_element_type.
    """
    n_head: int = 1

    @nn.compact
    def __call__(self, x):
        b, t, c = x.shape
        h = nn.GroupNorm(num_groups=1)(x)
        qkv = nn.Dense(3 * c, name="qkv_proj")(h)
        q, k, v = jnp.split(qkv.reshape(b, t, self.n_head, 3 * (c // self.n_head)), 3, axis=-1)
        scale = 1.0 / math.sqrt(math.sqrt(c // self.n_head))
        att = jnp.einsum("bthd,bshd->bhts", q * scale, k * scale,
                         preferred_element_type=jnp.float32)
        att = jax.nn.softmax(att, axis=-1).astype(v.dtype)
        y = jnp.einsum("bhts,bshd->bthd", att, v).reshape(b, t, c)
        return x + nn.Dense(c, name="out_proj")(y)


class Downsample1d(nn.Module):
    """x2 downsample via a fixed smoothing kernel ([1,3,3,1]/8).

    Depthwise (feature_group_count=C) — a dense CxC conv here would burn
    C× the FLOPs on a diagonal matrix (measured: dominated UNet cost)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        k = (jnp.array([1.0, 3.0, 3.0, 1.0]) / 8.0).astype(x.dtype)
        kernel = jnp.broadcast_to(k[:, None, None], (4, 1, c))
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(2,), padding=[(1, 1)],
            feature_group_count=c, dimension_numbers=("NHC", "HIO", "NHC"))


class Upsample1d(nn.Module):
    """x2 upsample: linear interpolation via depthwise transposed conv."""

    @nn.compact
    def __call__(self, x):
        b, t, c = x.shape
        k = (jnp.array([1.0, 3.0, 3.0, 1.0]) / 4.0).astype(x.dtype)
        kernel = jnp.broadcast_to(k[:, None, None], (4, 1, c))
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1,), padding=[(2, 2)],
            lhs_dilation=(2,), feature_group_count=c,
            dimension_numbers=("NHC", "HIO", "NHC"))


def timestep_broadcast(emb: jnp.ndarray, t_len: int) -> jnp.ndarray:
    """(B, C) timestep embedding -> (B, T, C) broadcast along time."""
    return jnp.broadcast_to(emb[:, None, :], (emb.shape[0], t_len, emb.shape[1]))


def upsample_to(cond: jnp.ndarray, t_len: int) -> jnp.ndarray:
    """Nearest-upsample conditioning (B, n, C) along time to length t_len.

    Replaces the reference UNets' F.interpolate of the latent conditioning
    signal up to the audio rate.
    """
    b, n, c = cond.shape
    if n == t_len:
        return cond
    if t_len % n == 0:
        # integer upsample factor: broadcast instead of gather (gathers at
        # (B, 65536, C) measurably drag on the TPU; broadcast is free-ish)
        r = t_len // n
        return jnp.broadcast_to(cond[:, :, None, :], (b, n, r, c)) \
                  .reshape(b, t_len, c)
    idx = (jnp.arange(t_len) * n) // t_len
    return cond[:, idx, :]
