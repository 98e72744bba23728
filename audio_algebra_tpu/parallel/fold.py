"""Sequence-FOLDED inference: the decode UNet forward with time blocks
folded into the batch dimension — the single-chip answer to the B=1
serving cliff.

Why this exists (r2-final traces, tools/profile.py trace --model outer):
at batch 1 the outer UNet's convolution fusions sustain ~27 TF/s vs
~194 TF/s at batch 16 — the conv layout's sublane dimension is the
batch, so small batches leave the MXU pipeline 1/16 filled and the
fused elementwise epilogues run on 1/16-full tiles. Folding the time
axis into batch fills the sublanes with work that was already there.

This is the single-chip twin of parallel/infer.py's sequence-parallel
decode (reference has neither — its generation batch is capped at 8 by
GPU memory, reference mirage.py:696): identical level split and halo
math, but every collective becomes a plain array op on one device:

  * ppermute halo exchange  ->  block-axis shift with zero edge fill
    (bit-identical to SAME padding of the unfolded sequence)
  * psum GroupNorm stats    ->  reduction over (block, T_local, C)
  * all_gather + replicated core -> ONE unfold (a free reshape) and the
    deep levels run once — no redundant per-shard compute at all, an
    advantage the true multi-chip path cannot have.

Tensors in the folded region are (B, n, T_local, C); convs see them as
(B*n, T_local, C) via free row-major reshapes. Parity with the
unsharded model is asserted in tests/test_fold_unet.py.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .infer import _stack3 as _stack3_full, _down2 as _down2_full, \
    _up2 as _up2_full

__all__ = ["decode_unet_seqfold", "pick_fold_blocks", "pick_folded_levels",
           "seqfold_ok"]


def seqfold_ok(batch: int) -> bool:
    """Serving gate: fold only where it was measured to win (TPU v5e,
    MIRAGE outer UNet forward, bf16): B=1 87.6 -> 19.4 ms, B=2 82.6 ->
    45.5 ms, B=4 88.2 -> 98.7 ms (fold LOSES once the batch itself
    half-fills the sublanes). AA_SEQFOLD=0 disables; AA_SEQFOLD_MAX_B
    moves the threshold."""
    import os
    if os.environ.get("AA_SEQFOLD", "1") == "0":
        return False
    return batch <= int(os.environ.get("AA_SEQFOLD_MAX_B", 2))


# ---------------------------------------------------------------- folding --

def _halo(x4: jnp.ndarray, halo_l: int, halo_r: int) -> jnp.ndarray:
    """Append neighbouring blocks' edge samples along T_local (axis 2).

    x4: (B, n, T_local, C). Block i takes the last `halo_l` samples of
    block i-1 and the first `halo_r` of block i+1; the outermost blocks
    zero-fill — exactly SAME zero padding of the unfolded sequence."""
    parts = []
    if halo_l > 0:
        left = jnp.pad(x4[:, :-1, x4.shape[2] - halo_l:, :],
                       ((0, 0), (1, 0), (0, 0), (0, 0)))
        parts.append(left)
    parts.append(x4)
    if halo_r > 0:
        right = jnp.pad(x4[:, 1:, :halo_r, :],
                        ((0, 0), (0, 1), (0, 0), (0, 0)))
        parts.append(right)
    return jnp.concatenate(parts, axis=2) if len(parts) > 1 else x4


def _as_batch(x4):
    b, n, tl, c = x4.shape
    return x4.reshape(b * n, tl, c)          # free: row-major adjacency


def _as_blocks(x3, n):
    bn, tl, c = x3.shape
    return x3.reshape(bn // n, n, tl, c)     # free


# ----------------------------------------------------------------- blocks --
# Mirrors of parallel/infer.py's primitives over (B, n, T_local, C).

def _conv5(x4, p, q=False):
    """5-tap SAME conv over the folded view. q=True takes the int8 MXU
    (turbo): per-channel symmetric quantisation with an EXACT dynamic
    amax (one fused reduce — at small batch the MXU is the bottleneck,
    not bandwidth, so the extra pass is free); the halo exchange runs on
    the int8 tensor (zero edge fill is exact under symmetric quant)."""
    if q:
        from ..models.blocks import quantize_act, conv1d_int8
        amax = jnp.max(jnp.abs(x4.astype(jnp.float32)), axis=(0, 1, 2))
        x8, s = quantize_act(x4, amax)
        xh = _as_batch(_halo(x8, 2, 2))
        y = conv1d_int8(xh, s, p["kernel"], p["bias"], x4.dtype,
                        padding="VALID")
        return _as_blocks(y, x4.shape[1])
    k = p["kernel"].astype(x4.dtype)
    xh = _as_batch(_halo(x4, 2, 2))
    y = jax.lax.conv_general_dilated(
        xh, k, window_strides=(1,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"))
    return _as_blocks(y + p["bias"].astype(x4.dtype), x4.shape[1])


def _gn1(x4, p, gelu=True, residual=None, eps=1e-6):
    """GroupNorm(1) [+GELU] [+residual]: f32 statistics over the FULL
    (fold, T_local, C) extent per batch item — the unfolded (T, C)."""
    x32 = x4.astype(jnp.float32)
    mu = jnp.mean(x32, axis=(1, 2, 3), keepdims=True)
    var = jnp.mean(jnp.square(x32), axis=(1, 2, 3), keepdims=True) \
        - jnp.square(mu)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    if gelu:
        y = jax.nn.gelu(y)
    y = y.astype(x4.dtype)
    return y if residual is None else residual + y


def _resconv(x4, p, is_last=False, q=False):
    if "skip_proj" in p:
        skip = x4 @ p["skip_proj"]["kernel"].astype(x4.dtype)
    else:
        skip = x4
    h = _conv5(x4, p["Conv1d_0"], q=q)
    h = _gn1(h, p["GroupNorm_0"])
    h = _conv5(h, p["Conv1d_1"], q=q)
    if is_last:
        return skip + h
    return _gn1(h, p["GroupNorm_1"], residual=skip)


def _stack3(x4, p, is_last=False, q=False):
    # folded levels are conv-only: attention levels (global time mixing)
    # always run unfolded — pick_folded_levels enforces the boundary
    x4 = _resconv(x4, p["m0"], q=q)
    x4 = _resconv(x4, p["m2"], q=q)
    return _resconv(x4, p["m4"], is_last=is_last, q=q)


def _resample_kernel(x4, taps, norm):
    c = x4.shape[-1]
    k = (jnp.asarray(taps, jnp.float32) / norm).astype(x4.dtype)
    return jnp.broadcast_to(k[:, None, None], (4, 1, c))


def _down2(x4):
    """x2 smoothing downsample ([1,3,3,1]/8, stride 2): one halo sample
    per side then VALID — same offsets as global padding=(1,1)."""
    kernel = _resample_kernel(x4, (1., 3., 3., 1.), 8.0)
    xh = _as_batch(_halo(x4, 1, 1))
    y = jax.lax.conv_general_dilated(
        xh, kernel, window_strides=(2,), padding="VALID",
        feature_group_count=x4.shape[-1],
        dimension_numbers=("NHC", "HIO", "NHC"))
    return _as_blocks(y, x4.shape[1])


def _up2(x4):
    """x2 linear-interp upsample (transposed depthwise [1,3,3,1]/4): one
    halo sample per side, lhs_dilation VALID yields exactly 2*T_local
    outputs at the right global offset."""
    kernel = _resample_kernel(x4, (1., 3., 3., 1.), 4.0)
    xh = _as_batch(_halo(x4, 1, 1))
    y = jax.lax.conv_general_dilated(
        xh, kernel, window_strides=(1,), padding=[(0, 0)],
        lhs_dilation=(2,), feature_group_count=x4.shape[-1],
        dimension_numbers=("NHC", "HIO", "NHC"))
    return _as_blocks(y, x4.shape[1])


# ------------------------------------------------------------------ model --

def pick_fold_blocks(batch: int, target_rows: int = 16) -> int:
    """Fold factor n so that B*n fills the bf16 sublane tile
    (target_rows). Power of two; 1 when the batch already fills."""
    n = 1
    while batch * n < target_rows:
        n *= 2
    return n


def pick_folded_levels(t_len: int, n_blocks: int, depth: int,
                       attn_start: int, min_local: int = 16) -> int:
    """How many outer levels run folded — same constraints as the
    sequence-parallel picker: even, >= min_local local slices through
    every stride-2 resample, attention levels unfolded, bottleneck
    unfolded."""
    j = 0
    while (j < attn_start and j < depth - 1
           and (t_len >> j) % (2 * n_blocks) == 0
           and (t_len >> j) // n_blocks >= min_local):
        j += 1
    return j


def decode_unet_seqfold(params, x, t, cond=None, *,
                        n_blocks: Optional[int] = None,
                        io_channels: int = 2, cond_dim: int = 0,
                        n_attn_layers: int = 4,
                        c_mults: Sequence[int] = (256, 256) + (512,) * 12,
                        depth: Optional[int] = None, pqmf_bands: int = 1,
                        timestep_features: int = 16,
                        folded_levels: Optional[int] = None,
                        quantized: bool = False):
    """DiffusionAttnUnet1D forward with time folded into batch.

    params/x/t/cond exactly as models/unet1d.py:120 (x (B, C_io, T),
    t (B,), cond (B, cond_dim, n)); returns v (B, C_io, T). Numerically
    the unsharded model's output (same f32 statistics, same op order) up
    to reduction-order rounding. `n_blocks` defaults to filling a
    16-row sublane tile from the batch size."""
    p = params["params"] if "params" in params else params
    depth = depth or len(c_mults)
    c_mults = list(c_mults)[:depth]
    n_io = io_channels * pqmf_bands
    attn_start = depth - n_attn_layers
    b, _, t_len = x.shape
    if n_blocks is None:
        # int8 native tiles are 32 sublane rows (bf16: 16) — fold deeper
        # in turbo so the int8 convs run on full tiles
        n_blocks = pick_fold_blocks(b, 32 if quantized else 16)
    if folded_levels is None:
        n_folded = pick_folded_levels(t_len, n_blocks, depth, attn_start)
    else:
        n_folded = folded_levels
    assert 0 <= n_folded <= min(attn_start, depth - 1), \
        f"folded_levels={n_folded} conflicts with attn_start={attn_start}"
    if n_folded == 0 or n_blocks == 1:
        n_blocks = 1     # nothing folds: plain full-tensor forward below

    xbtc = jnp.swapaxes(x, -1, -2)

    # ---- entry on the full sequence (then fold: a free reshape)
    w = p["timestep_embed"]["weight"]
    f = 2.0 * math.pi * t[:, None] * w[None, :, 0]
    t_emb = jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1)
    h = jnp.concatenate(
        [xbtc, jnp.broadcast_to(t_emb[:, None, :],
                                (b, t_len, t_emb.shape[-1]))], axis=-1)
    if cond_dim > 0:
        if cond is None:
            raise ValueError("cond_dim > 0 requires a conditioning signal")
        cond_btc = jnp.swapaxes(cond, -1, -2)
        n = cond_btc.shape[1]
        gi = (jnp.arange(t_len) * n) // t_len
        h = jnp.concatenate([h, jnp.take(cond_btc, gi, axis=1)], axis=-1)

    h = h.reshape(b, n_blocks, t_len // n_blocks, h.shape[-1])

    # ---- folded down sweep (levels 0..n_folded-1)
    skips_folded = []
    for j in range(n_folded):
        h = _stack3(h, p[f"stack_{j:03d}"], q=quantized)
        skips_folded.append(h)
        h = _down2(h)

    # ---- unfold (free reshape): the deep levels run ONCE on the full
    # sequence — unlike true sequence parallelism there is no redundant
    # replicated compute here
    h = h.reshape(b, h.shape[1] * h.shape[2], h.shape[3])
    skips_full = []
    for j in range(n_folded, depth):
        h = _stack3_full(h, p[f"stack_{j:03d}"], c_mults[j], c_mults[j],
                         attn=j >= attn_start, axis=None)
        if j < depth - 1:
            skips_full.append(h)
            h = _down2_full(h, None)
    for j in reversed(range(n_folded, depth)):
        if j < depth - 1:
            h = _up2_full(h, None)
            h = jnp.concatenate([h, skips_full.pop()], axis=-1)
        c_out = c_mults[j - 1] if j > 0 else n_io
        h = _stack3_full(h, p[f"stack_{2 * depth - 1 - j:03d}"], c_mults[j],
                         c_out, attn=j >= attn_start, axis=None,
                         is_last=j == 0)

    # ---- refold and run the up sweep on the locally-kept skips
    h = h.reshape(b, n_blocks, h.shape[1] // n_blocks, h.shape[-1])
    for j in reversed(range(n_folded)):
        h = _up2(h)
        h = jnp.concatenate([h, skips_folded.pop()], axis=-1)
        h = _stack3(h, p[f"stack_{2 * depth - 1 - j:03d}"], is_last=j == 0,
                    q=quantized)

    out = h.reshape(b, t_len, h.shape[-1])
    return jnp.swapaxes(out, -1, -2)
