"""Sequence parallelism: shard the TIME axis of 1-D audio/latent tensors
over a mesh axis.

The reference handles long audio purely by chunking (SURVEY.md §5
long-context: 65536-sample training chunks, 1-4M-sample generation
windows, crossfade stitching) — it has no sequence parallelism anywhere.
These primitives are the TPU-native stretch the survey called out
("optional stretch = shard the 2048-frame latent axis via shard_map"):
they let ONE oversized window run across chips instead of being chunked,
with XLA/ppermute moving only the conv halos over ICI.

Building blocks (all under shard_map, all parity-tested against the
unsharded ops on a virtual mesh):

  * conv1d_seq      — SAME conv with ppermute halo exchange (K-1 boundary
                      samples total, the only cross-chip traffic)
  * groupnorm1_seq  — GroupNorm(num_groups=1)+GELU with psum'd statistics
  * resconv_block_seq — a full ResConvBlock (conv-GN-GELU ×2 + residual)
                      running sequence-parallel end to end
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _halo_exchange(x_local: jnp.ndarray, halo: int, axis_name: str,
                   halo_r: int | None = None):
    """Append the left/right neighbours' edge samples along time (axis 1).

    x_local: (B, T_shard, C). `halo` samples arrive from the left
    neighbour, `halo_r` (default: same as `halo`) from the right —
    asymmetric halos match XLA's SAME padding split for even kernels.
    Edge shards pad with zeros — matching SAME zero padding of the
    unsharded conv.
    """
    halo_l = halo
    if halo_r is None:
        halo_r = halo_l
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    parts = []
    if halo_l > 0:
        right_edge = x_local[:, -halo_l:]           # sent to the right
        from_left = jax.lax.ppermute(
            right_edge, axis_name, [(i, i + 1) for i in range(n - 1)])
        parts.append(jnp.where(idx == 0, 0.0, from_left))
    parts.append(x_local)
    if halo_r > 0:
        left_edge = x_local[:, :halo_r]             # sent to the left
        from_right = jax.lax.ppermute(
            left_edge, axis_name, [(i + 1, i) for i in range(n - 1)])
        parts.append(jnp.where(idx == n - 1, 0.0, from_right))
    if len(parts) == 1:
        return x_local
    return jnp.concatenate(parts, axis=1)


def conv1d_seq(x: jnp.ndarray, kernel: jnp.ndarray, mesh: Mesh,
               axis: str = "data") -> jnp.ndarray:
    """SAME stride-1 conv of (B, T, Cin) x (K, Cin, Cout), T sharded over
    `axis`. Only the K-1 boundary samples cross chips, split (K-1)//2
    left / K//2 right to match XLA's SAME padding (low half first) so
    even kernels align exactly with the unsharded op."""
    k = kernel.shape[0]
    halo_l, halo_r = (k - 1) // 2, k // 2

    def local(x_local, kern):
        xh = _halo_exchange(x_local, halo_l, axis, halo_r=halo_r)
        return jax.lax.conv_general_dilated(
            xh, kern, window_strides=(1,), padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"))

    return jax.shard_map(
        partial(local),
        mesh=mesh,
        in_specs=(P(None, axis, None), P()),
        out_specs=P(None, axis, None),
    )(x, kernel)


def groupnorm1_seq(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                   mesh: Mesh, axis: str = "data", gelu: bool = False,
                   eps: float = 1e-6) -> jnp.ndarray:
    """GroupNorm(num_groups=1) [+GELU] with time sharded over `axis`:
    per-shard partial sums, one psum of two scalars per batch element."""

    def local(x_local, scale, bias):
        x32 = x_local.astype(jnp.float32)
        n_local = x_local.shape[1] * x_local.shape[2]
        s1 = jax.lax.psum(jnp.sum(x32, axis=(1, 2)), axis)     # (B,)
        s2 = jax.lax.psum(jnp.sum(jnp.square(x32), axis=(1, 2)), axis)
        n = n_local * jax.lax.axis_size(axis)
        mu = (s1 / n)[:, None, None]
        var = (s2 / n)[:, None, None] - jnp.square(mu)
        y = (x32 - mu) * jax.lax.rsqrt(var + eps)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        if gelu:
            y = jax.nn.gelu(y)
        return y.astype(x_local.dtype)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis, None), P(), P()),
        out_specs=P(None, axis, None),
    )(x, scale, bias)


def resconv_block_seq(x: jnp.ndarray, params: dict, mesh: Mesh,
                      axis: str = "data") -> jnp.ndarray:
    """A full ResConvBlock (conv5-GN-GELU-conv5-GN-GELU + residual) running
    sequence-parallel. `params` is the flax param subtree of
    models.blocks.ResConvBlock (same leaves: Conv1d_{0,1} kernels/biases,
    GroupNorm_{0,1} scale/bias) for the c_in == c_out case."""
    p = params["params"] if "params" in params else params
    h = conv1d_seq(x, p["Conv1d_0"]["kernel"].astype(x.dtype), mesh, axis)
    h = h + p["Conv1d_0"]["bias"].astype(x.dtype)
    h = groupnorm1_seq(h, p["GroupNorm_0"]["scale"], p["GroupNorm_0"]["bias"],
                       mesh, axis, gelu=True)
    h = conv1d_seq(h, p["Conv1d_1"]["kernel"].astype(x.dtype), mesh, axis)
    h = h + p["Conv1d_1"]["bias"].astype(x.dtype)
    h = groupnorm1_seq(h, p["GroupNorm_1"]["scale"], p["GroupNorm_1"]["bias"],
                       mesh, axis, gelu=True)
    return x + h
