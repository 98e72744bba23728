"""Grouped GroupNorm (+ FiLM time-modulation) (+ SiLU) for the MIRAGE
inner UNet (UNetCFG1d, resnet_groups=8 — reference
StackedAELatentDiffusionCond.py:297-317 via audio_diffusion_pytorch).

Same playbook that took the decode UNet from 2.37x to 2.57x realtime
(ops/pallas/groupnorm.py): the statistics are a plain XLA reduce that
fuses into the OUTPUT FUSION of the conv producing x, and the normalise
apply never goes through XLA's GroupNorm pattern (whose reduce-normalise
layout preferences force full-tensor layout copies around every GN).

The grouped twist: stats are per (batch, group), but GN's affine, the
FiLM modulation, and the normalisation all compose into ONE per-(B, C)
affine
    y = silu(x * S + T)
    S = rstd_g * scale_c * (1 + film_scale_bc)
    T = (bias_c - mu_g * rstd_g * scale_c) * (1 + film_scale_bc) + film_shift_bc
where the S/T planes are tiny (B, C) tensors computed in XLA. The big
tensor is touched exactly once: either by an XLA elementwise fusion
(AA_LDM_GN_PALLAS=0) or by a Pallas apply kernel on the (T, B, C) view /
flat (T*B, C) rows (AA_LDM_GN_PALLAS=1, full sublane fill at any batch).

Both paths are equivalence-tested against flax nn.GroupNorm + FiLM +
silu in tests/test_pallas_kernels.py. The module-level switch
AA_LDM_GN (default "0" until an on-chip A/B lands) controls whether UNetCFG1d routes through here
at all — the fold is equivalence-tested (f32 stats, eps 1e-6 matching
flax's default) and never slower in principle, but flip it off to get
the literal flax graph back.
"""
from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .groupnorm import MAX_TILE_ELEMS


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _silu(y):
    return y * jax.nn.sigmoid(y)


def _affine_silu_kernel(x_ref, s_ref, t_ref, o_ref, *, silu: bool):
    """(tile, B, C) x * S[B, C] + T[B, C], optional SiLU."""
    x = x_ref[...].astype(jnp.float32)
    y = x * s_ref[0].astype(jnp.float32)[None] \
        + t_ref[0].astype(jnp.float32)[None]
    if silu:
        y = _silu(y)
    o_ref[...] = y.astype(o_ref.dtype)


def _flat_affine_silu_kernel(x_ref, s_ref, t_ref, o_ref, *, b: int,
                             silu: bool):
    """Flat (rows, C) variant: blocks start at multiples of b, so local
    row i belongs to batch i % b — materialised by a (rows, b) one-hot
    matmul against the (b, C) planes (full sublane fill at any batch)."""
    x = x_ref[...].astype(jnp.float32)                       # (R, C)
    rows = x.shape[0]
    row_b = jax.lax.broadcasted_iota(jnp.int32, (rows, b), 0) % b
    col_b = jax.lax.broadcasted_iota(jnp.int32, (rows, b), 1)
    onehot = (row_b == col_b).astype(jnp.float32)            # (R, b)
    s = onehot @ s_ref[:b].astype(jnp.float32)               # (R, C)
    t = onehot @ t_ref[:b].astype(jnp.float32)
    y = x * s + t
    if silu:
        y = _silu(y)
    o_ref[...] = y.astype(o_ref.dtype)


def _pallas_apply(x, s_planes, t_planes, *, silu: bool):
    """x (B, T, C); planes (B, C) f32. (T, B, C)-view kernel for B >= 8,
    flat (T*B, C) rows below (sublane fill)."""
    b, t_len, c = x.shape
    xt = jnp.swapaxes(x, 0, 1)                               # bitcast
    if b < 8 and (t_len * b) % 8 == 0:
        total = t_len * b
        x2 = xt.reshape(total, c)
        tile = total
        while tile * c > MAX_TILE_ELEMS and tile % 2 == 0 \
                and (tile // 2) % b == 0:
            tile //= 2
        y2 = pl.pallas_call(
            functools.partial(_flat_affine_silu_kernel, b=b, silu=silu),
            grid=(total // tile,),
            in_specs=[pl.BlockSpec((tile, c), lambda j: (j, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((b, c), lambda j: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((b, c), lambda j: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tile, c), lambda j: (j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((total, c), x.dtype),
            interpret=_interpret(),
            input_output_aliases={0: 0},
            cost_estimate=pl.CostEstimate(
                flops=6 * total * c, transcendentals=total * c if silu else 0,
                bytes_accessed=2 * total * c * x.dtype.itemsize),
        )(x2, s_planes, t_planes)
        return jnp.swapaxes(y2.reshape(t_len, b, c), 0, 1)
    tile = t_len
    while tile * b * c > MAX_TILE_ELEMS and tile % 2 == 0:
        tile //= 2
    yt = pl.pallas_call(
        functools.partial(_affine_silu_kernel, silu=silu),
        grid=(t_len // tile,),
        in_specs=[pl.BlockSpec((tile, b, c), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, b, c), lambda j: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, b, c), lambda j: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, b, c), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_len, b, c), x.dtype),
        interpret=_interpret(),
        input_output_aliases={0: 0},
        cost_estimate=pl.CostEstimate(
            flops=6 * t_len * b * c,
            transcendentals=t_len * b * c if silu else 0,
            bytes_accessed=2 * t_len * b * c * x.dtype.itemsize),
    )(xt, s_planes[None], t_planes[None])
    return jnp.swapaxes(yt, 0, 1)


def supported(x_shape, groups: int) -> bool:
    if len(x_shape) != 3:
        return False
    b, t_len, c = x_shape
    return (c % 128 == 0 and c % groups == 0 and t_len >= 8
            and t_len % 8 == 0 and (t_len & (t_len - 1)) == 0 and b <= 128)


def grouped_gn_film_silu(x: jnp.ndarray, scale: jnp.ndarray,
                         bias: jnp.ndarray, groups: int,
                         film_scale: jnp.ndarray | None = None,
                         film_shift: jnp.ndarray | None = None,
                         silu: bool = True,
                         eps: float = 1e-6) -> jnp.ndarray:
    """silu(GroupNorm(x; groups, scale, bias) * (1 + film_scale) +
    film_shift) on x (B, T, C), numerically matching flax
    nn.GroupNorm(num_groups=groups) (f32 stats, eps 1e-6) followed by the FiLM
    modulation of unet_cfg1d.ResnetBlock. film_* are (B, 1, C) or None."""
    b, t_len, c = x.shape
    cg = c // groups
    x32 = x.astype(jnp.float32)
    # stats per (B, G): a reduce XLA fuses into x's producing fusion
    xg = x32.reshape(b, t_len, groups, cg)
    mu = jnp.mean(xg, axis=(1, 3))                          # (B, G)
    var = jnp.maximum(jnp.mean(jnp.square(xg), axis=(1, 3))
                      - jnp.square(mu), 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    # fold normalise + GN affine + FiLM into per-(B, C) planes
    mu_c = jnp.repeat(mu, cg, axis=1)                       # (B, C)
    rstd_c = jnp.repeat(rstd, cg, axis=1)
    scale32 = scale.astype(jnp.float32)[None]               # (1, C)
    bias32 = bias.astype(jnp.float32)[None]
    s_planes = rstd_c * scale32
    t_planes = bias32 - mu_c * s_planes
    if film_scale is not None:
        fs = film_scale.astype(jnp.float32).reshape(b, c)
        s_planes = s_planes * (1.0 + fs)
        t_planes = t_planes * (1.0 + fs)
    if film_shift is not None:
        t_planes = t_planes + film_shift.astype(jnp.float32).reshape(b, c)

    if (_os.environ.get("AA_LDM_GN_PALLAS", "0") == "1"
            and supported(x.shape, groups)):
        return _pallas_apply(x, s_planes, t_planes, silu=silu)
    y = x32 * s_planes[:, None, :] + t_planes[:, None, :]
    if silu:
        y = _silu(y)
    return y.astype(x.dtype)
