"""Sequence-parallel inference: the FULL decode UNet forward sharded over
the time axis of a device mesh.

The reference has no multi-GPU inference at all — generation batch is
capped at 8 by single-GPU memory (reference mirage.py:696, Destructo.ipynb
cell 17 "CUDA memory limits") and long outputs are chunked + crossfaded.
This module is the TPU-native answer for latency: ONE diffusion decode
spread across chips, sharding the 65536-sample time axis so every conv
runs on a T/n slice and only kernel halos (2 samples per conv5 boundary)
cross ICI.

Strategy — sharded outer, replicated core:

  * Levels 0..J-1 (long T, all the FLOPs: T halves per level so levels
    below J hold < 2^-J of the conv work) run sequence-parallel using the
    parity-tested primitives' pattern (parallel/seq.py): ppermute halo
    exchange for conv5 / the fixed [1,3,3,1] resamplers, psum'd GroupNorm
    statistics (two f32 scalars per batch element per norm).
  * At level J the shards all_gather along time (T_J is small) and the
    deep levels — including every self-attention level, whose mixing is
    global over time — run replicated on every chip.
  * The up sweep re-scatters at level J-1: each chip dynamic-slices its
    time slab and continues sequence-parallel, consuming the skip
    activations it kept locally from the down sweep (skips never move).

Everything happens inside ONE `jax.shard_map` region, so XLA sees the
whole forward and schedules the ppermutes/psums against compute.

The functions here are pure re-expressions of models/unet1d.py's
DiffusionAttnUnet1D over its own param pytree (same leaves, natural-sort
module names: stack_NNN / m0..m5 / Conv1d_k, GroupNorm_k, skip_proj) and
are parity-tested against the unsharded model on a virtual mesh
(tests/test_seqpar_unet.py). Turbo/int8 paths are intentionally out of
scope: sequence parallelism targets the multi-chip latency case, which is
bf16/f32.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .seq import _halo_exchange

__all__ = ["decode_unet_seqpar", "pick_sharded_levels"]


# ---------------------------------------------------------------- blocks ---
# Pure functions over DiffusionAttnUnet1D param subtrees. `axis` is the mesh
# axis name when the time dimension is sharded, or None in the replicated
# core (then ops use plain SAME padding / full-tensor statistics).

def _conv5(x, p, axis):
    k = p["kernel"].astype(x.dtype)
    if axis is not None:
        x = _halo_exchange(x, 2, axis)
        pad = "VALID"
    else:
        pad = [(2, 2)]
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(1,), padding=pad,
        dimension_numbers=("NHC", "HIO", "NHC"))
    return y + p["bias"].astype(x.dtype)


def _gn1(x, p, axis, gelu=True, residual=None, eps=1e-6):
    """GroupNorm(1) [+GELU] [+residual], stats psum'd across time shards.
    Mirrors blocks.GroupNorm1's jnp path: f32 stats over (T, C), residual
    added AFTER the activation."""
    x32 = x.astype(jnp.float32)
    if axis is not None:
        s1 = jax.lax.psum(jnp.sum(x32, axis=(1, 2)), axis)
        s2 = jax.lax.psum(jnp.sum(jnp.square(x32), axis=(1, 2)), axis)
        n = x.shape[1] * x.shape[2] * jax.lax.axis_size(axis)
        mu = (s1 / n)[:, None, None]
        var = (s2 / n)[:, None, None] - jnp.square(mu)
    else:
        mu = jnp.mean(x32, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True) \
            - jnp.square(mu)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    if gelu:
        y = jax.nn.gelu(y)
    y = y.astype(x.dtype)
    return y if residual is None else residual + y


def _resconv(x, p, c_out, axis, is_last=False):
    if "skip_proj" in p:
        skip = x @ p["skip_proj"]["kernel"].astype(x.dtype)
    else:
        skip = x
    h = _conv5(x, p["Conv1d_0"], axis)
    h = _gn1(h, p["GroupNorm_0"], axis)
    h = _conv5(h, p["Conv1d_1"], axis)
    if is_last:
        return skip + h
    return _gn1(h, p["GroupNorm_1"], axis, residual=skip)


def _attn(x, p, n_head):
    """SelfAttention1d mirror (replicated core only — attention mixes the
    whole time axis)."""
    b, t, c = x.shape
    h = _gn1(x, p["GroupNorm_0"], None, gelu=False)
    qkv = h @ p["qkv_proj"]["kernel"].astype(x.dtype) \
        + p["qkv_proj"]["bias"].astype(x.dtype)
    hd = c // n_head
    q, k, v = [u.reshape(b, t, n_head, hd) for u in jnp.split(qkv, 3, axis=-1)]
    scale = 1.0 / math.sqrt(math.sqrt(hd))
    att = jnp.einsum("bthd,bshd->bhts", q * scale, k * scale,
                     preferred_element_type=jnp.float32)
    att = jax.nn.softmax(att, axis=-1).astype(v.dtype)
    y = jnp.einsum("bhts,bshd->bthd", att, v).reshape(b, t, c)
    y = y @ p["out_proj"]["kernel"].astype(x.dtype) \
        + p["out_proj"]["bias"].astype(x.dtype)
    return x + y


def _stack3(x, p, c_mid, c_out, attn, axis, is_last=False):
    x = _resconv(x, p["m0"], c_mid, axis)
    if attn:
        x = _attn(x, p["m1"], max(1, c_mid // 32))
    x = _resconv(x, p["m2"], c_mid, axis)
    if attn:
        x = _attn(x, p["m3"], max(1, c_mid // 32))
    x = _resconv(x, p["m4"], c_out, axis, is_last=is_last)
    if attn and not is_last:
        x = _attn(x, p["m5"], max(1, c_out // 32))
    return x


def _resample_kernel(x, taps, norm):
    c = x.shape[-1]
    k = (jnp.asarray(taps, jnp.float32) / norm).astype(x.dtype)
    return jnp.broadcast_to(k[:, None, None], (4, 1, c))


def _down2(x, axis):
    """x2 smoothing downsample ([1,3,3,1]/8, stride 2). Sharded: one halo
    sample per side, then VALID — offsets line up with the global
    padding=(1,1) op (first local output reads x[2*g0-1 .. 2*g0+2])."""
    kernel = _resample_kernel(x, (1., 3., 3., 1.), 8.0)
    if axis is not None:
        xh = _halo_exchange(x, 1, axis)
        return jax.lax.conv_general_dilated(
            xh, kernel, window_strides=(2,), padding="VALID",
            feature_group_count=x.shape[-1],
            dimension_numbers=("NHC", "HIO", "NHC"))
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(2,), padding=[(1, 1)],
        feature_group_count=x.shape[-1],
        dimension_numbers=("NHC", "HIO", "NHC"))


def _up2(x, axis):
    """x2 linear-interp upsample (transposed depthwise [1,3,3,1]/4).
    Sharded: one halo sample per side, lhs_dilation VALID yields exactly
    the shard's 2*T_local outputs at the right global offset."""
    kernel = _resample_kernel(x, (1., 3., 3., 1.), 4.0)
    if axis is not None:
        xh = _halo_exchange(x, 1, axis)
        return jax.lax.conv_general_dilated(
            xh, kernel, window_strides=(1,), padding=[(0, 0)],
            lhs_dilation=(2,), feature_group_count=x.shape[-1],
            dimension_numbers=("NHC", "HIO", "NHC"))
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding=[(2, 2)],
        lhs_dilation=(2,), feature_group_count=x.shape[-1],
        dimension_numbers=("NHC", "HIO", "NHC"))


# ----------------------------------------------------------------- model ---

def pick_sharded_levels(t_len: int, n_shards: int, depth: int,
                        attn_start: int, min_local: int = 16) -> int:
    """How many outer UNet levels to run sequence-parallel: every level
    must keep an even, >= min_local local slice (halo exchange + the
    stride-2 resample need that), attention levels must be replicated
    (global time mixing), and at least the bottleneck stays replicated."""
    j = 0
    while (j < attn_start and j < depth - 1
           and (t_len >> j) % (2 * n_shards) == 0
           and (t_len >> j) // n_shards >= min_local):
        j += 1
    return j


def decode_unet_seqpar(params, x, t, cond=None, *, mesh: Mesh,
                       axis: str = "seq", io_channels: int = 2,
                       cond_dim: int = 0, n_attn_layers: int = 4,
                       c_mults: Sequence[int] = (256, 256) + (512,) * 12,
                       depth: Optional[int] = None, pqmf_bands: int = 1,
                       timestep_features: int = 16,
                       sharded_levels: Optional[int] = None):
    """DiffusionAttnUnet1D forward, time axis sharded over mesh[`axis`].

    params/x/t/cond exactly as models/unet1d.py:120 (x (B, C_io, T),
    t (B,), cond (B, cond_dim, n)); returns v (B, C_io, T). Output is
    numerically the unsharded model's (same f32 statistics, same op
    order) up to collective reduction order.
    """
    p = params["params"] if "params" in params else params
    depth = depth or len(c_mults)
    c_mults = list(c_mults)[:depth]
    n_io = io_channels * pqmf_bands
    attn_start = depth - n_attn_layers
    n_shards = mesh.shape[axis]
    b, _, t_len = x.shape
    if sharded_levels is None:
        n_sharded = pick_sharded_levels(t_len, n_shards, depth, attn_start)
    else:
        n_sharded = sharded_levels
    assert 0 <= n_sharded <= min(attn_start, depth - 1), \
        f"sharded_levels={n_sharded} conflicts with attn_start={attn_start}"
    assert t_len % n_shards == 0

    if cond_dim > 0 and cond is None:
        raise ValueError("cond_dim > 0 requires a conditioning signal")

    xbtc = jnp.swapaxes(x, -1, -2)
    cond_btc = None if cond is None else jnp.swapaxes(cond, -1, -2)

    def fwd(xl, t, cond_btc, p):
        idx = jax.lax.axis_index(axis)
        t_local = xl.shape[1]
        g0 = idx * t_local                         # global start of my slab

        # ---- entry: timestep Fourier features + upsampled conditioning,
        # computed directly on the local slab
        w = p["timestep_embed"]["weight"]
        f = 2.0 * math.pi * t[:, None] * w[None, :, 0]
        t_emb = jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1)
        h = jnp.concatenate(
            [xl, jnp.broadcast_to(t_emb[:, None, :],
                                  (b, t_local, t_emb.shape[-1]))], axis=-1)
        if cond_btc is not None:
            n = cond_btc.shape[1]
            gi = ((g0 + jnp.arange(t_local)) * n) // t_len
            h = jnp.concatenate(
                [h, jnp.take(cond_btc, gi, axis=1)], axis=-1)

        # ---- sharded down sweep (levels 0..n_sharded-1)
        skips_local = []
        for j in range(n_sharded):
            h = _stack3(h, p[f"stack_{j:03d}"], c_mults[j], c_mults[j],
                        attn=False, axis=axis)
            skips_local.append(h)
            h = _down2(h, axis)

        # ---- replicated core: gather time, run the deep levels in full
        # on every shard (< 2^-J of the conv FLOPs live down here)
        h = jax.lax.all_gather(h, axis, axis=1, tiled=True)
        skips_full = []
        for j in range(n_sharded, depth):
            h = _stack3(h, p[f"stack_{j:03d}"], c_mults[j], c_mults[j],
                        attn=j >= attn_start, axis=None)
            if j < depth - 1:
                skips_full.append(h)
                h = _down2(h, None)
        for j in reversed(range(n_sharded, depth)):
            if j < depth - 1:
                h = _up2(h, None)
                h = jnp.concatenate([h, skips_full.pop()], axis=-1)
            c_out = c_mults[j - 1] if j > 0 else n_io
            h = _stack3(h, p[f"stack_{2 * depth - 1 - j:03d}"], c_mults[j],
                        c_out, attn=j >= attn_start, axis=None,
                        is_last=j == 0)

        # ---- re-scatter: my slab of the replicated result, then the
        # sharded up sweep consumes the skips that never left this chip
        loc = h.shape[1] // n_shards
        h = jax.lax.dynamic_slice_in_dim(h, idx * loc, loc, axis=1)
        for j in reversed(range(n_sharded)):
            h = _up2(h, axis)
            h = jnp.concatenate([h, skips_local.pop()], axis=-1)
            c_out = c_mults[j - 1] if j > 0 else n_io
            h = _stack3(h, p[f"stack_{2 * depth - 1 - j:03d}"], c_mults[j],
                        c_out, attn=False, axis=axis, is_last=j == 0)
        return h

    out = jax.shard_map(
        fwd, mesh=mesh,
        in_specs=(P(None, axis, None), P(), P(), P()),
        out_specs=P(None, axis, None),
    )(xbtc, t, cond_btc, p)
    return jnp.swapaxes(out, -1, -2)
