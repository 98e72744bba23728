"""Pallas fused GroupNorm(1) [+ GELU] for the UNet hot path.

Why this kernel exists: XLA's TPU reduce wants the reduced dimension
minormost. The UNet's GroupNorm(num_groups=1) reduces (T, C) per batch, so
XLA laid the stats/normalise fusions out time-minor ({1,2,0}) while every
surrounding conv runs channel-minor ({2,0,1}) — inserting two full-tensor
layout copies around EVERY GroupNorm, 69 ms of the 350 ms UNet forward
(hlo_stats trace, B=16). Here both phases are Pallas kernels that read the
tensor in its natural row-major layout: the statistics come from an XLA
reduce that FUSES into the output fusion of the conv that produced x
(zero extra HBM passes — see groupnorm1_gelu_btc), and the normalise +
affine (+ optional exact-tanh GELU) apply is, since round 3, ALSO an XLA
elementwise chain at batch >= 16 (it input-fuses into the consuming conv:
bf16 2.57 -> 2.69x) while smaller batches keep the Pallas apply kernel.
HBM traffic (Pallas apply): 1 read + 1 write vs XLA's historical
reduce-read + 2 copies (r+w each) + apply (r+w) = 7 passes — the layout
ping-pong only ever came from the REDUCE, which is why stats-in-XLA +
apply-in-XLA is now safe. (AA_GN_XLA_STATS=0 falls back to a Pallas stats
pass — 2R+1W — kept for measurement.)

Semantics match flax nn.GroupNorm(num_groups=1) (eps 1e-6, f32 stats) —
parity-tested against it in tests/test_pallas_kernels.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    # CPU (tests / virtual meshes) runs the kernels interpreted
    return jax.default_backend() == "cpu"


def supported(x_shape, dtype) -> bool:
    """The kernel wants lane-aligned channels and sublane-friendly tiles.

    AA_GN_MIN_B (default 1) additionally gates on batch: the (T, B, C)
    view puts B in the sublane dimension, so small batches under-fill the
    native (16, 128) bf16 tiles — a dial for measuring the pallas-vs-XLA
    crossover at small B."""
    if len(x_shape) != 3:
        return False
    b, t_len, c = x_shape
    if b < int(_os.environ.get("AA_GN_MIN_B", 1)):
        return False
    # t_len >= 8 also rejects t_len == 0 (0 & -1 == 0 passes the power-of-2
    # check!) — deep UNet levels of a too-short init dummy reach T == 0
    return c % 128 == 0 and t_len >= 8 and t_len % 8 == 0 \
        and (t_len & (t_len - 1)) == 0


# ------------------------------------------------- (T, B, C)-view variant ---
# The XLA conv fusions emit (B, T, C) tensors in layout {2,0,1} (C minor,
# then B, then T). A pallas_call pins its operands to row-major, which on
# the logical (B, T, C) shape would force a {2,0,1}->{2,1,0} copy of the
# whole tensor. But row-major on the TRANSPOSED (T, B, C) view is exactly
# the same byte order as {2,0,1} on (B, T, C) — so swapaxes(x, 0, 1) in,
# swapaxes back out, and layout assignment turns both transposes into
# bitcasts: zero copies.

def _stats_kernel_tbc(x_ref, out_ref):
    x = x_ref[...].astype(jnp.float32)          # (tile, B, C)
    s1 = jnp.sum(x, axis=(0, 2))                # (B,)
    s2 = jnp.sum(jnp.square(x), axis=(0, 2))
    out_ref[0, :, :] = jnp.pad(
        jnp.stack([s1, s2], axis=-1), ((0, 0), (0, 126)))


def _gelu(y):
    """Exact tanh-GELU. NEGATIVE RESULT, kept as a warning: the apply
    kernels spend ~13 ms/forward here (AA_GN_NOGELU=1 timing probe,
    236 -> 223 ms turbo), but replacing jnp.tanh with a Padé(5,4)
    rational made the forward 66 ms SLOWER (measured 244 -> 310, both
    the divide and an rsqrt-squared reciprocal) — Mosaic lowers jnp.tanh
    to the native transcendental unit, and a handful of generic VPU
    mul/add/select ops costs far more than one native tanh. Don't
    'optimise' this with polynomial approximations."""
    if _os.environ.get("AA_GN_NOGELU") == "1":   # timing probe only
        return y
    return 0.5 * y * (1.0 + jnp.tanh(0.7978845608028654
                                     * (y + 0.044715 * y * y * y)))


def _gn_core(x_ref, stats_ref, scale_ref, bias_ref, gelu: bool):
    x = x_ref[...].astype(jnp.float32)          # (tile, B, C)
    mu = stats_ref[0, :, 0][None, :, None]
    rstd = stats_ref[0, :, 1][None, :, None]
    y = (x - mu) * rstd
    y = y * scale_ref[0, 0, :].astype(jnp.float32)[None, None, :] \
        + bias_ref[0, 0, :].astype(jnp.float32)[None, None, :]
    if gelu:
        y = _gelu(y)
    return y


def _apply_kernel_tbc(x_ref, stats_ref, scale_ref, bias_ref, o_ref,
                      *, gelu: bool):
    y = _gn_core(x_ref, stats_ref, scale_ref, bias_ref, gelu)
    o_ref[...] = y.astype(o_ref.dtype)


def _apply_quant_kernel_tbc(x_ref, stats_ref, scale_ref, bias_ref, qinv_ref,
                            o_ref, *, gelu: bool):
    """Turbo-int8 emit: int8 = round(y * qinv_c) clipped, with per-channel
    inverse quantisation scales — costs zero extra HBM passes over the
    plain apply (the int8 output is 4x SMALLER to write than bf16)."""
    y = _gn_core(x_ref, stats_ref, scale_ref, bias_ref, gelu)
    qinv = qinv_ref[0, 0, :].astype(jnp.float32)[None, None, :]
    o_ref[...] = jnp.clip(jnp.round(y * qinv), -127, 127).astype(jnp.int8)


def _apply_res_kernel_tbc(x_ref, res_ref, stats_ref, scale_ref, bias_ref,
                          o_ref, *, gelu: bool):
    """apply + fused residual add: out = res + gelu(gn(x)). Folding the
    block's skip connection in here saves the separate XLA add fusion's
    read+write of the normalised tensor (~2 HBM passes per ResConvBlock)."""
    y = _gn_core(x_ref, stats_ref, scale_ref, bias_ref, gelu)
    o_ref[...] = (res_ref[...].astype(jnp.float32) + y).astype(o_ref.dtype)


def _fused_gn_kernel_tbc(*refs, nt: int, n: int, eps: float, gelu: bool,
                         has_res: bool, emit_amax: bool, quant: bool,
                         q_emit: bool = False):
    """Single-launch two-phase GN: grid = (2, nt) — phase 0 walks the tiles
    accumulating (sum, sumsq) partials into a persistent VMEM scratch (the
    last step converts them to (mu, rstd) in place); phase 1 walks them
    again normalising (+GELU) (+residual add / int8 quantise / amax emit).
    One launch instead of the stats/apply pair, and the XLA glue between
    them (partial reduce + rsqrt fusion) folds in. The TPU grid is
    sequential, so the scratch carries across phases (same mechanism the
    amax accumulator already uses). Index maps must stay affine — scalar-
    prefetch and jnp.where index maps each cost minutes of Mosaic compile
    per kernel on this toolchain (measured) — so the stats phase re-reads
    every tile; that full-rate stats read is why this variant is dispatched
    only below a size threshold where launch overhead dominates traffic."""
    k = 0
    x_ref = refs[k]; k += 1
    res_ref = None
    if has_res:
        res_ref = refs[k]; k += 1
    scale_ref, bias_ref = refs[k], refs[k + 1]; k += 2
    qinv_ref = None
    if quant or q_emit:
        qinv_ref = refs[k]; k += 1
    o_ref = refs[k]; k += 1
    amax_ref = None
    if emit_amax:
        amax_ref = refs[k]; k += 1
    o8_ref = None
    if q_emit:
        o8_ref = refs[k]; k += 1
    scr_ref = refs[k]

    phase = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(phase == 0)
    def _stats():
        x = x_ref[...].astype(jnp.float32)
        part = jnp.pad(jnp.stack([jnp.sum(x, axis=(0, 2)),
                                  jnp.sum(jnp.square(x), axis=(0, 2))],
                                 axis=-1), ((0, 0), (0, 126)))

        @pl.when(j == 0)
        def _init():
            scr_ref[...] = part

        @pl.when(j > 0)
        def _acc():
            scr_ref[...] = scr_ref[...] + part

        @pl.when(j == nt - 1)
        def _finalize():
            s = scr_ref[...]
            mu = s[:, 0] / n
            var = jnp.maximum(s[:, 1] / n - jnp.square(mu), 0.0)
            rstd = jax.lax.rsqrt(var + eps)
            scr_ref[...] = jnp.pad(jnp.stack([mu, rstd], axis=-1),
                                   ((0, 0), (0, 126)))

    @pl.when(phase == 1)
    def _apply():
        x = x_ref[...].astype(jnp.float32)
        s = scr_ref[...]
        mu = s[:, 0][None, :, None]
        rstd = s[:, 1][None, :, None]
        y = (x - mu) * rstd
        y = y * scale_ref[0, 0, :].astype(jnp.float32)[None, None, :] \
            + bias_ref[0, 0, :].astype(jnp.float32)[None, None, :]
        if gelu:
            y = _gelu(y)
        if quant:
            qinv = qinv_ref[0, 0, :].astype(jnp.float32)[None, None, :]
            o_ref[...] = jnp.clip(jnp.round(y * qinv), -127, 127
                                  ).astype(jnp.int8)
        elif res_ref is not None:
            out = res_ref[...].astype(jnp.float32) + y
            o_ref[...] = out.astype(o_ref.dtype)
            if o8_ref is not None:
                qi = qinv_ref[0, 0, :].astype(jnp.float32)[None, None, :]
                o8_ref[...] = jnp.clip(jnp.round(out * qi), -127, 127
                                       ).astype(jnp.int8)
            if amax_ref is not None:
                ta = jnp.max(jnp.abs(out), axis=0, keepdims=True)

                @pl.when(j == 0)
                def _ai():
                    amax_ref[...] = ta

                @pl.when(j > 0)
                def _aa():
                    amax_ref[...] = jnp.maximum(amax_ref[...], ta)
        else:
            o_ref[...] = y.astype(o_ref.dtype)


def _single_launch(xt, scale, bias, residual, quant_scale, *, gelu, eps,
                   tile, nt, emit_amax, q_emit_scale=None):
    """Assemble the one-launch two-phase pallas_call on the (T, B, C) view.

    Grid (2, nt) with phase-independent AFFINE index maps — every operand
    block cycles through both phases (extra prefetch/flush traffic), which
    is why the dispatcher only routes small tensors here. Outputs are NOT
    aliased onto x: phase 1 re-reads x tile j while out tile j-1 flushes,
    and any eager flush of the untouched out buffer during phase 0 must
    not clobber x."""
    t_len, b, c = xt.shape
    has_res = residual is not None
    quant = quant_scale is not None
    n = t_len * c

    tile_spec = pl.BlockSpec((tile, b, c), lambda p, j: (j, 0, 0),
                             memory_space=pltpu.VMEM)
    const_c = pl.BlockSpec((1, 1, c), lambda p, j: (0, 0, 0),
                           memory_space=pltpu.VMEM)

    in_specs = [tile_spec]
    operands = [xt]
    if has_res:
        in_specs.append(tile_spec)
        operands.append(jnp.swapaxes(residual, 0, 1))      # bitcast
    in_specs += [const_c, const_c]
    operands += [scale.reshape(1, 1, c), bias.reshape(1, 1, c)]
    q_emit = q_emit_scale is not None
    if quant or q_emit:
        src = quant_scale if quant else q_emit_scale
        qinv = (1.0 / jnp.maximum(src.astype(jnp.float32), 1e-12))
        qinv = jnp.broadcast_to(qinv, (c,)).reshape(1, 1, c)
        in_specs.append(const_c)
        operands.append(qinv)

    out_dtype = jnp.int8 if quant else xt.dtype
    out_shape = [jax.ShapeDtypeStruct((t_len, b, c), out_dtype)]
    out_specs = [tile_spec]
    if emit_amax:
        out_shape.append(jax.ShapeDtypeStruct((1, b, c), jnp.float32))
        out_specs.append(pl.BlockSpec((1, b, c), lambda p, j: (0, 0, 0),
                                      memory_space=pltpu.VMEM))
    if q_emit:
        out_shape.append(jax.ShapeDtypeStruct((t_len, b, c), jnp.int8))
        out_specs.append(tile_spec)

    kernel = functools.partial(_fused_gn_kernel_tbc, nt=nt, n=n, eps=eps,
                               gelu=gelu, has_res=has_res,
                               emit_amax=emit_amax, quant=quant,
                               q_emit=q_emit)
    passes = 2.0 + (1.0 if has_res else 0.0)
    wr = 0.25 if quant else 1.0
    res = pl.pallas_call(
        kernel,
        grid=(2, nt),
        in_specs=in_specs,
        out_specs=out_specs[0] if len(out_specs) == 1 else tuple(out_specs),
        out_shape=out_shape[0] if len(out_shape) == 1 else tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((b, 128), jnp.float32)],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=int((12 if has_res else 10) * t_len * b * c),
            transcendentals=t_len * b * c if gelu else 0,
            bytes_accessed=int((passes + wr) * t_len * b * c
                               * xt.dtype.itemsize)),
    )(*operands)
    if q_emit:
        yt, amax, y8 = res
        return (jnp.swapaxes(yt, 0, 1), jnp.max(amax[0], axis=0),
                jnp.swapaxes(y8, 0, 1))
    if emit_amax:
        yt, amax = res
        return jnp.swapaxes(yt, 0, 1), jnp.max(amax[0], axis=0)
    return jnp.swapaxes(res, 0, 1)


def _apply_res_amax_kernel_tbc(x_ref, res_ref, stats_ref, scale_ref, bias_ref,
                               o_ref, amax_ref, *, gelu: bool):
    """apply + residual add + free per-channel amax of the OUTPUT (turbo:
    the amax sets the int8 grid for the NEXT block's first conv, so the
    residual stream quantises with a dynamic, exact bound instead of an
    analytic one that compounds down the depth). The amax accumulates
    across the sequential TPU grid into a single (1, B, C) block — zero
    extra HBM passes over the plain residual apply."""
    y = _gn_core(x_ref, stats_ref, scale_ref, bias_ref, gelu)
    out = res_ref[...].astype(jnp.float32) + y
    o_ref[...] = out.astype(o_ref.dtype)
    tile_amax = jnp.max(jnp.abs(out), axis=0, keepdims=True)   # (1, B, C)
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        amax_ref[...] = tile_amax

    @pl.when(j > 0)
    def _acc():
        amax_ref[...] = jnp.maximum(amax_ref[...], tile_amax)


def _apply_res_amax_q_kernel_tbc(x_ref, res_ref, stats_ref, scale_ref,
                                 bias_ref, qinv_ref, o_ref, amax_ref, o8_ref,
                                 *, gelu: bool):
    """Residual apply + amax + int8 twin emit (turbo amax-carry mode).

    Same as _apply_res_amax_kernel_tbc plus a THIRD output: the block
    output quantised as int8 on a per-channel grid supplied by qinv — the
    previous diffusion step's amax of this very tensor × a safety margin
    (activations drift slowly across v-DDIM steps; overshoot clips). The
    next block's conv1 consumes the int8 twin directly, deleting the
    separate quantize_act pass (14.9 ms/forward of clamp_convert fusions,
    traced) for one extra 0.25-pass int8 write here."""
    y = _gn_core(x_ref, stats_ref, scale_ref, bias_ref, gelu)
    out = res_ref[...].astype(jnp.float32) + y
    o_ref[...] = out.astype(o_ref.dtype)
    qinv = qinv_ref[0, 0, :].astype(jnp.float32)[None, None, :]
    o8_ref[...] = jnp.clip(jnp.round(out * qinv), -127, 127).astype(jnp.int8)
    tile_amax = jnp.max(jnp.abs(out), axis=0, keepdims=True)   # (1, B, C)
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        amax_ref[...] = tile_amax

    @pl.when(j > 0)
    def _acc():
        amax_ref[...] = jnp.maximum(amax_ref[...], tile_amax)


# ------------------------------------------------ flattened-rows variant ---
# For SMALL batches the (T, B, C) view starves the sublane dimension: B
# rides in the second-minor axis, and with B=4 the native bf16 (16, 128)
# tiles are 25% full (int8 (32, 128): 12.5%). Row-major (T, B, C) is
# byte-identical to (T*B, C), so this variant works on 2-D row blocks
# (full sublane utilisation at any B) and maps each row to its batch item
# arithmetically: rows cycle through b with period b, so a per-tile
# one-hot (R, b) built from iota%b turns per-b stats and per-row mu/rstd
# into two tiny matmuls. MEASURED SLOWER than the 3-D path on the MIRAGE
# stages (see dispatcher note) — dispatch-disabled by default.

def _pick_tbc_tile(t_len: int, b: int, c: int, itemsize: int) -> int:
    """Time-tile for a (tile, b, c) block under the scoped-VMEM budget.

    The block's VMEM footprint pads the minor two dims to the hardware
    tile — sublane (8/16/32 rows for 4/2/1-byte dtypes) × lane (128).
    At b=1 f32 that's an 8× inflation over the logical element count;
    sizing the tile on logical elements alone overflows the 16 MiB
    scoped-vmem limit (measured: 17.96M requested at (65536, 1, 256) f32
    in the residual apply variant)."""
    sublane = {4: 8, 2: 16, 1: 32}.get(itemsize, 8)
    b_pad = -(-b // sublane) * sublane
    c_pad = -(-c // 128) * 128
    tile = t_len
    while tile * b_pad * c_pad > MAX_TILE_ELEMS and tile % 2 == 0:
        tile //= 2
    return tile


def _flat_tile_ok(t_len: int, b: int, c: int) -> bool:
    """The flat launch halves its row tile while staying batch-aligned;
    shapes where halving stalls (odd row counts) would hand Mosaic one
    whole-tensor VMEM block — reject them at dispatch so the (T, B, C)
    path takes over instead of a compile failure."""
    tile = t_len * b
    while tile * c > MAX_TILE_ELEMS and tile % 2 == 0 \
            and (tile // 2) % b == 0:
        tile //= 2
    return tile * c <= 4 * MAX_TILE_ELEMS


def _flat_apply_kernel(*refs, b: int, gelu: bool, has_res: bool,
                       quant: bool, emit_amax: bool, q_emit: bool):
    """Single-phase normalise+affine(+GELU)(+residual)(+turbo extras) on
    the flattened (T*B, C) row view — full sublane fill at ANY batch size
    (the (T, B, C) view fills only B/16 of each bf16 tile, 6.25% at
    MIRAGE's B=1; the int8 (32, 128) tiles only B/32). Statistics arrive
    precomputed (the XLA reduce that rides the producing conv's fusion),
    so there is no in-kernel stats pass to pay for. Every block starts at
    a multiple of b, so local row i belongs to batch item i % b — a
    static pattern materialised by a tiny (R, b) one-hot matmul.

    Turbo extras mirror the (T, B, C) kernels: `quant` emits int8 on the
    analytic per-channel grid (GN_0 -> conv2 path); `emit_amax`
    accumulates the per-channel |out| max across the sequential grid into
    a (1, C) block (here the rows already mix all batch items, so no
    outer max-over-B is needed); `q_emit` adds the int8 twin of the
    residual output on the previous diffusion step's amax grid."""
    k = 0
    x_ref = refs[k]; k += 1
    res_ref = None
    if has_res:
        res_ref = refs[k]; k += 1
    stats_ref, scale_ref, bias_ref = refs[k], refs[k + 1], refs[k + 2]
    k += 3
    qinv_ref = None
    if quant or q_emit:
        qinv_ref = refs[k]; k += 1
    o_ref = refs[k]; k += 1
    amax_ref = None
    if emit_amax:
        amax_ref = refs[k]; k += 1
    o8_ref = None
    if q_emit:
        o8_ref = refs[k]; k += 1

    x = x_ref[...].astype(jnp.float32)                      # (R, C)
    rows = x.shape[0]
    row_b = jax.lax.broadcasted_iota(jnp.int32, (rows, b), 0) % b
    col_b = jax.lax.broadcasted_iota(jnp.int32, (rows, b), 1)
    onehot = (row_b == col_b).astype(jnp.float32)           # (R, b)
    mu = onehot @ stats_ref[0, :b][:, None]                 # (R, 1)
    rstd = onehot @ stats_ref[1, :b][:, None]
    y = (x - mu) * rstd
    y = y * scale_ref[0, :].astype(jnp.float32)[None, :] \
        + bias_ref[0, :].astype(jnp.float32)[None, :]
    if gelu:
        y = _gelu(y)
    if quant:
        qi = qinv_ref[0, :].astype(jnp.float32)[None, :]
        o_ref[...] = jnp.clip(jnp.round(y * qi), -127, 127).astype(jnp.int8)
        return
    out = y if res_ref is None else res_ref[...].astype(jnp.float32) + y
    o_ref[...] = out.astype(o_ref.dtype)
    if o8_ref is not None:
        qi = qinv_ref[0, :].astype(jnp.float32)[None, :]
        o8_ref[...] = jnp.clip(jnp.round(out * qi), -127, 127
                               ).astype(jnp.int8)
    if amax_ref is not None:
        ta = jnp.max(jnp.abs(out), axis=0, keepdims=True)   # (1, C)
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _init():
            amax_ref[...] = ta

        @pl.when(j > 0)
        def _acc():
            amax_ref[...] = jnp.maximum(amax_ref[...], ta)


def _flat_apply_launch(xt, stats2, scale, bias, residual, *, gelu, b,
                       quant_scale=None, emit_amax=False, q_emit_scale=None):
    """xt is the (T, B, C) view; reshape to (T*B, C) rows (bitcast) and
    normalise with precomputed stats2 (2, 128) f32 = [mu_row; rstd_row]
    (cols 0..b-1 live). Returns the (B, T, C) tensor (+ (C,) amax
    [+ int8 twin] in the turbo variants)."""
    t_len, b_, c = xt.shape
    x2 = xt.reshape(t_len * b_, c)                # row-major: bitcast
    total = t_len * b_
    tile = total
    while tile * c > MAX_TILE_ELEMS and tile % 2 == 0 and (tile // 2) % b_ == 0:
        tile //= 2
    nt = total // tile
    tile_spec = pl.BlockSpec((tile, c), lambda j: (j, 0),
                             memory_space=pltpu.VMEM)
    const_s = pl.BlockSpec((2, 128), lambda j: (0, 0),
                           memory_space=pltpu.VMEM)
    const_c = pl.BlockSpec((1, c), lambda j: (0, 0),
                           memory_space=pltpu.VMEM)
    has_res = residual is not None
    quant = quant_scale is not None
    q_emit = q_emit_scale is not None
    in_specs = [tile_spec]
    operands = [x2]
    if has_res:
        in_specs.append(tile_spec)
        operands.append(jnp.swapaxes(residual, 0, 1).reshape(total, c))
    in_specs += [const_s, const_c, const_c]
    operands += [stats2, scale.reshape(1, c), bias.reshape(1, c)]
    if quant or q_emit:
        src = quant_scale if quant else q_emit_scale
        qinv = (1.0 / jnp.maximum(src.astype(jnp.float32), 1e-12))
        qinv = jnp.broadcast_to(qinv, (c,)).reshape(1, c)
        in_specs.append(const_c)
        operands.append(qinv)

    out_dtype = jnp.int8 if quant else xt.dtype
    out_shape = [jax.ShapeDtypeStruct((total, c), out_dtype)]
    out_specs = [tile_spec]
    if emit_amax:
        out_shape.append(jax.ShapeDtypeStruct((1, c), jnp.float32))
        out_specs.append(pl.BlockSpec((1, c), lambda j: (0, 0),
                                      memory_space=pltpu.VMEM))
    if q_emit:
        out_shape.append(jax.ShapeDtypeStruct((total, c), jnp.int8))
        out_specs.append(tile_spec)

    wr = 0.25 if quant else (1.25 if q_emit else 1.0)
    res = pl.pallas_call(
        functools.partial(_flat_apply_kernel, b=b, gelu=gelu,
                          has_res=has_res, quant=quant,
                          emit_amax=emit_amax, q_emit=q_emit),
        grid=(nt,),
        in_specs=in_specs,
        out_specs=out_specs[0] if len(out_specs) == 1 else tuple(out_specs),
        out_shape=out_shape[0] if len(out_shape) == 1 else tuple(out_shape),
        interpret=_interpret(),
        # x is dead after the apply — reuse its buffer, except when the
        # primary output is int8 (different byte size)
        input_output_aliases={} if quant else {0: 0},
        cost_estimate=pl.CostEstimate(
            flops=(12 if has_res else 10) * total * c,
            transcendentals=total * c if gelu else 0,
            bytes_accessed=int(((2 if has_res else 1) + wr)
                               * total * c * xt.dtype.itemsize)),
    )(*operands)

    def unflat(v):
        return jnp.swapaxes(v.reshape(t_len, b_, c), 0, 1)

    if q_emit:
        y2, amax, y8 = res
        return unflat(y2), amax[0], unflat(y8)
    if emit_amax:
        y2, amax = res
        return unflat(y2), amax[0]
    return unflat(res)


def _rows_gn_kernel(*refs, nt: int, n: int, b: int, eps: float, gelu: bool,
                    has_res: bool, emit_amax: bool, quant: bool,
                    q_emit: bool):
    k = 0
    x_ref = refs[k]; k += 1
    res_ref = None
    if has_res:
        res_ref = refs[k]; k += 1
    scale_ref, bias_ref = refs[k], refs[k + 1]; k += 2
    qinv_ref = None
    if quant or q_emit:
        qinv_ref = refs[k]; k += 1
    o_ref = refs[k]; k += 1
    amax_ref = None
    if emit_amax:
        amax_ref = refs[k]; k += 1
    o8_ref = None
    if q_emit:
        o8_ref = refs[k]; k += 1
    scr_ref = refs[k]

    phase = pl.program_id(0)
    j = pl.program_id(1)
    rows = x_ref.shape[0]
    # rows % b == 0 and every block starts at a multiple of b, so the
    # local row index mod b IS the batch index — block-invariant one-hot
    row_b = jax.lax.broadcasted_iota(jnp.int32, (rows, b), 0) % b
    col_b = jax.lax.broadcasted_iota(jnp.int32, (rows, b), 1)
    onehot = (row_b == col_b).astype(jnp.float32)          # (R, b)

    @pl.when(phase == 0)
    def _stats():
        x = x_ref[...].astype(jnp.float32)                  # (R, C)
        s_rows = jnp.sum(x, axis=1)                         # (R,)
        q_rows = jnp.sum(jnp.square(x), axis=1)
        s1 = s_rows[None, :] @ onehot                       # (1, b)
        s2 = q_rows[None, :] @ onehot
        part = jnp.pad(jnp.concatenate([s1, s2], axis=0),
                       ((0, 0), (0, 128 - b)))              # (2, 128)

        @pl.when(j == 0)
        def _init():
            scr_ref[...] = part

        @pl.when(j > 0)
        def _acc():
            scr_ref[...] = scr_ref[...] + part

        @pl.when(j == nt - 1)
        def _finalize():
            s = scr_ref[...]
            mu = s[0, :b] / n
            var = jnp.maximum(s[1, :b] / n - jnp.square(mu), 0.0)
            rstd = jax.lax.rsqrt(var + eps)
            scr_ref[...] = jnp.pad(jnp.stack([mu, rstd], axis=0),
                                   ((0, 0), (0, 128 - b)))

    @pl.when(phase == 1)
    def _apply():
        x = x_ref[...].astype(jnp.float32)
        s = scr_ref[...]
        mu = (onehot @ s[0, :b][:, None])                   # (R, 1)
        rstd = (onehot @ s[1, :b][:, None])
        y = (x - mu) * rstd
        y = y * scale_ref[0, :].astype(jnp.float32)[None, :] \
            + bias_ref[0, :].astype(jnp.float32)[None, :]
        if gelu:
            y = _gelu(y)
        if quant:
            qi = qinv_ref[0, :].astype(jnp.float32)[None, :]
            o_ref[...] = jnp.clip(jnp.round(y * qi), -127, 127
                                  ).astype(jnp.int8)
        elif res_ref is not None:
            out = res_ref[...].astype(jnp.float32) + y
            o_ref[...] = out.astype(o_ref.dtype)
            if o8_ref is not None:
                qi = qinv_ref[0, :].astype(jnp.float32)[None, :]
                o8_ref[...] = jnp.clip(jnp.round(out * qi), -127, 127
                                       ).astype(jnp.int8)
            if amax_ref is not None:
                ta = jnp.max(jnp.abs(out), axis=0, keepdims=True)  # (1, C)

                @pl.when(j == 0)
                def _ai():
                    amax_ref[...] = ta

                @pl.when(j > 0)
                def _aa():
                    amax_ref[...] = jnp.maximum(amax_ref[...], ta)
        else:
            o_ref[...] = y.astype(o_ref.dtype)


def _rows_launch(xt, scale, bias, residual, quant_scale, *, gelu, eps, b,
                 emit_amax, q_emit_scale=None):
    """Two-phase single-launch GN on the flattened (T*B, C) row view."""
    t_len, b_, c = xt.shape
    x2 = xt.reshape(t_len * b_, c)               # row-major: bitcast
    total = t_len * b_
    has_res = residual is not None
    quant = quant_scale is not None
    q_emit = q_emit_scale is not None
    n = t_len * c                                # per-batch-item count

    tile = total
    while tile * c > MAX_TILE_ELEMS and tile % 2 == 0 and (tile // 2) % b_ == 0:
        tile //= 2
    nt = total // tile

    tile_spec = pl.BlockSpec((tile, c), lambda p, j: (j, 0),
                             memory_space=pltpu.VMEM)
    const_c = pl.BlockSpec((1, c), lambda p, j: (0, 0),
                           memory_space=pltpu.VMEM)

    in_specs = [tile_spec]
    operands = [x2]
    if has_res:
        in_specs.append(tile_spec)
        operands.append(jnp.swapaxes(residual, 0, 1).reshape(total, c))
    in_specs += [const_c, const_c]
    operands += [scale.reshape(1, c), bias.reshape(1, c)]
    if quant or q_emit:
        src = quant_scale if quant else q_emit_scale
        qinv = (1.0 / jnp.maximum(src.astype(jnp.float32), 1e-12))
        qinv = jnp.broadcast_to(qinv, (c,)).reshape(1, c)
        in_specs.append(const_c)
        operands.append(qinv)

    out_dtype = jnp.int8 if quant else xt.dtype
    out_shape = [jax.ShapeDtypeStruct((total, c), out_dtype)]
    out_specs = [tile_spec]
    if emit_amax:
        out_shape.append(jax.ShapeDtypeStruct((1, c), jnp.float32))
        out_specs.append(pl.BlockSpec((1, c), lambda p, j: (0, 0),
                                      memory_space=pltpu.VMEM))
    if q_emit:
        out_shape.append(jax.ShapeDtypeStruct((total, c), jnp.int8))
        out_specs.append(tile_spec)

    kernel = functools.partial(_rows_gn_kernel, nt=nt, n=n, b=b_, eps=eps,
                               gelu=gelu, has_res=has_res,
                               emit_amax=emit_amax, quant=quant,
                               q_emit=q_emit)
    res = pl.pallas_call(
        kernel,
        grid=(2, nt),
        in_specs=in_specs,
        out_specs=out_specs[0] if len(out_specs) == 1 else tuple(out_specs),
        out_shape=out_shape[0] if len(out_shape) == 1 else tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((2, 128), jnp.float32)],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=int((12 if has_res else 10) * total * c),
            transcendentals=total * c if gelu else 0,
            bytes_accessed=int((2.0 + (1.0 if has_res else 0.0)
                                + (0.25 if quant else 1.0)) * total * c
                               * xt.dtype.itemsize)),
    )(*operands)

    def unflat(v):
        return jnp.swapaxes(v.reshape(t_len, b_, c), 0, 1)

    if q_emit:
        yt, amax, y8 = res
        return unflat(yt), amax[0], unflat(y8)
    if emit_amax:
        yt, amax = res
        return unflat(yt), amax[0]
    return unflat(res)


# Per-grid-step tile cap (elements). 512 KiB bf16 tiles double-buffer
# comfortably in VMEM (the 16 MiB scoped-vmem limit OOMs at 1M-elem tiles
# in the 3-operand residual variant); swept in-context via AA_GN_TILE by
# tools/profile.py forward — standalone microbenches are invalid here
# because outside a conv-layout context the (T,B,C) view is a real
# transpose, not a bitcast.
import os as _os
MAX_TILE_ELEMS = int(_os.environ.get("AA_GN_TILE", 262_144))


def groupnorm1_gelu_btc(x: jnp.ndarray, scale: jnp.ndarray,
                        bias: jnp.ndarray, gelu: bool = True,
                        eps: float = 1e-6,
                        residual: jnp.ndarray | None = None,
                        quant_scale: jnp.ndarray | None = None,
                        stats_stride: int = 1,
                        emit_amax: bool = False,
                        q_emit_scale: jnp.ndarray | None = None) -> jnp.ndarray:
    """Public entry. The standard (non-turbo) variants are DIFFERENTIABLE:
    they route through a jax.custom_vjp whose forward is the Pallas kernel
    and whose backward is the standard GN[+GELU] gradient in plain XLA
    (recompute-based, f32 — see _gn_bwd). Without this, jax.grad through
    the kernel dies with `NotImplementedError: JVP with aliasing not
    supported` (the input_output_aliases={0:0} buffer donation), which any
    DVAE/stacked fine-tune at MXU-aligned widths hits. The turbo int8
    paths (quant_scale / emit_amax / q_emit_scale) are inference-only and
    stay outside AD on purpose (int8 outputs have no useful gradient).
    See groupnorm1_gelu_btc's full parameter docs on _gn_impl."""
    if quant_scale is None and not emit_amax and q_emit_scale is None:
        if residual is None:
            return _gn_ad(x, scale, bias, gelu, eps, stats_stride)
        return _gn_res_ad(x, scale, bias, residual, gelu, eps, stats_stride)
    return _gn_impl(x, scale, bias, gelu=gelu, eps=eps, residual=residual,
                    quant_scale=quant_scale, stats_stride=stats_stride,
                    emit_amax=emit_amax, q_emit_scale=q_emit_scale)


def _gn_ref_fwd(x, scale, bias, gelu: bool, eps: float):
    """Pure-jnp GN(1)[+GELU] matching the Pallas numerics exactly: f32
    statistics over (T, C) per batch, var >= 0 clamp, tanh-GELU (_gelu).
    The backward pass is jax.vjp of this — XLA fuses the whole chain."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.maximum(jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
                      - jnp.square(mu), 0.0)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32)[None, None, :] \
        + bias.astype(jnp.float32)[None, None, :]
    if gelu:
        y = _gelu(y)
    return y


def _gn_bwd_core(x, scale, bias, dout, gelu: bool, eps: float):
    # recompute-based VJP: no activations saved beyond (x, scale, bias)
    _, vjp = jax.vjp(lambda xx, ss, bb:
                     _gn_ref_fwd(xx, ss, bb, gelu, eps), x, scale, bias)
    dx, dscale, dbias = vjp(dout.astype(jnp.float32))
    return (dx.astype(x.dtype), dscale.astype(scale.dtype),
            dbias.astype(bias.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _gn_ad(x, scale, bias, gelu, eps, stats_stride):
    return _gn_impl(x, scale, bias, gelu=gelu, eps=eps,
                    stats_stride=stats_stride)


def _gn_ad_fwd(x, scale, bias, gelu, eps, stats_stride):
    return _gn_ad(x, scale, bias, gelu, eps, stats_stride), (x, scale, bias)


def _gn_ad_bwd(gelu, eps, stats_stride, res, dout):
    x, scale, bias = res
    return _gn_bwd_core(x, scale, bias, dout, gelu, eps)


_gn_ad.defvjp(_gn_ad_fwd, _gn_ad_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _gn_res_ad(x, scale, bias, residual, gelu, eps, stats_stride):
    return _gn_impl(x, scale, bias, gelu=gelu, eps=eps, residual=residual,
                    stats_stride=stats_stride)


def _gn_res_ad_fwd(x, scale, bias, residual, gelu, eps, stats_stride):
    out = _gn_res_ad(x, scale, bias, residual, gelu, eps, stats_stride)
    return out, (x, scale, bias)


def _gn_res_ad_bwd(gelu, eps, stats_stride, res, dout):
    x, scale, bias = res
    dx, dscale, dbias = _gn_bwd_core(x, scale, bias, dout, gelu, eps)
    # out = residual + gelu(gn(x)): the residual's cotangent is dout itself
    return dx, dscale, dbias, dout


_gn_res_ad.defvjp(_gn_res_ad_fwd, _gn_res_ad_bwd)


def _gn_impl(x: jnp.ndarray, scale: jnp.ndarray,
             bias: jnp.ndarray, gelu: bool = True,
             eps: float = 1e-6,
             residual: jnp.ndarray | None = None,
             quant_scale: jnp.ndarray | None = None,
             stats_stride: int = 1,
             emit_amax: bool = False,
             q_emit_scale: jnp.ndarray | None = None) -> jnp.ndarray:
    """GroupNorm(1) [+GELU] [+residual add] on a (B, T, C) tensor via the
    (T, B, C) view, keeping the conv layout end to end (see comment above).
    With `residual`, returns residual + gelu(gn(x)). With `quant_scale`
    (turbo-int8 mode, exclusive with residual), the output is emitted as
    int8 = round(y / quant_scale) clipped to ±127, consumed by the int8
    conv path — quantisation costs zero extra HBM passes. `stats_stride`
    > 1 (turbo only) estimates the statistics from every stride-th tile —
    at 16M elements a 1/4 sample changes mu/rstd by ~0.05%, far below the
    int8 grid, and saves most of the stats pass's HBM read. With
    `emit_amax` (turbo, requires residual), returns (out, per-channel
    amax (C,) f32 of out) computed for free inside the apply pass. With
    `q_emit_scale` (C,) additionally (turbo amax-carry: the scale is the
    PREVIOUS diffusion step's amax of this output × margin), returns
    (out, amax, out_int8) — the int8 twin the next block's conv1 consumes
    directly, replacing its separate quantize_act pass."""
    if emit_amax:
        assert residual is not None and quant_scale is None, \
            "emit_amax is the residual-apply variant (turbo conv1 path)"
    if q_emit_scale is not None:
        assert emit_amax, "q_emit_scale rides on the emit_amax variant"
    # checked here, BEFORE the size dispatch: the single-launch kernel's
    # `if quant ... elif residual` would otherwise silently drop the
    # residual add for small tensors instead of failing fast
    assert quant_scale is None or residual is None, \
        "turbo quantise is exclusive with residual"
    b, t_len, c = x.shape
    xt = jnp.swapaxes(x, 0, 1)                  # (T, B, C) — bitcast
    tile = _pick_tbc_tile(t_len, b, c, jnp.dtype(x.dtype).itemsize)
    nt = t_len // tile
    stride = stats_stride if stats_stride > 1 and nt >= 4 * stats_stride else 1
    nst = nt // stride

    # Flattened-rows variant: NEGATIVE RESULT, disabled by default. The
    # theory was sound (the (T, B, C) view under-fills sublane tiles at
    # small B: 25% bf16 / 12.5% int8 at B=4) but the measured MIRAGE
    # stages got SLOWER with it (inner CFG stage 17.1 -> 31.4 s, outer
    # 30.3 -> 32.8 s at B=4) — the two-phase full-rate stats reads and
    # in-kernel one-hot matmuls cost more than the utilisation win at
    # these shapes. Kept behind AA_GN_ROWS_MAX_B (exclusive bound; 0 =
    # off) with an equivalence test, in case a future shape profits.
    rows_max_b = int(_os.environ.get("AA_GN_ROWS_MAX_B", 0))
    if b < rows_max_b and (b & (b - 1)) == 0 and (t_len * b) % 8 == 0:
        return _rows_launch(xt, scale, bias, residual, quant_scale,
                            gelu=gelu, eps=eps, b=b, emit_amax=emit_amax,
                            q_emit_scale=q_emit_scale)

    if _os.environ.get("AA_GN_XLA_STATS", "1") == "1":
        # DEFAULT: XLA computes the (sum, sumsq) reduction so it fuses into
        # the OUTPUT FUSION of the conv that produced x — the stats pass's
        # full HBM read (~1/3 of all GN traffic at stride 1) disappears.
        # Measured (same-day A/B, 35-step destructo bench, B=16): bf16
        # 2.37 -> 2.57x realtime (step 9200 -> 8506 ms); turbo int8
        # 3.32 -> 3.35x AND rel-RMS vs bf16 improves 0.023 -> 0.014
        # (stats are exact again instead of stride-4 subsampled). The
        # round-1 layout fear (XLA re-laying the tensor time-minor around
        # reduces) does not apply to a reduce alone — only the normalise
        # APPLY forced that, and it stays in Pallas. AA_GN_XLA_STATS=0
        # restores the Pallas stats-pass path below.
        # Exact same f32-accumulation numerics as the Pallas stats pass.
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=(1, 2))
        var = jnp.maximum(jnp.mean(jnp.square(x32), axis=(1, 2))
                          - jnp.square(mu), 0.0)
        rstd = jax.lax.rsqrt(var + eps)
        # XLA normalise apply (DEFAULT at b >= AA_GN_XLA_APPLY_MIN_B = 16,
        # the shapes where it was measured faster; the r2 verdict's "last
        # bf16 bite"): with the stats already fused into the producer
        # conv, the apply is a pure elementwise chain — XLA input-fuses it
        # into the CONSUMING conv, so the apply's HBM write + conv re-read
        # disappear. Measured (same-day A/B, 35-step destructo bench,
        # B=16): bf16 2.57 -> 2.69x realtime (step 8496 -> 8133 ms), turbo
        # int8 3.36 -> 3.40x. The round-1 layout fear was about the
        # REDUCE, not a broadcast chain. Exact same numerics as the Pallas
        # apply (f32 math, tanh-GELU). AA_GN_XLA_APPLY=1 forces it at any
        # batch, =0 disables entirely (restoring the Pallas apply).
        # MEASURED NEGATIVE at small batch: forcing it at MIRAGE's B=4
        # collapsed generation 6.16 -> 2.93x realtime — below b=16 XLA
        # re-lays the normalise chain time-minor around the per-batch
        # broadcast instead of fusing it, reintroducing the layout
        # ping-pong this kernel exists to kill. Do NOT lower the gate.
        # A/B CAVEATS: (1) this path only exists with AA_GN_XLA_STATS=1
        # (the default) — with Pallas stats (AA_GN_XLA_STATS=0) it is
        # silently ignored, there is no XLA apply off the Pallas-stats
        # branch; (2) when it runs it takes precedence over
        # AA_GN_FLAT_MAX_B (the flat small-batch Pallas apply below never
        # runs); (3) it drops the input_output_aliases={0:0} x-buffer
        # donation the Pallas apply paths use, so peak HBM can rise by one
        # activation.
        _xla_apply_env = _os.environ.get("AA_GN_XLA_APPLY", "")
        _xla_apply = _xla_apply_env == "1" or (
            _xla_apply_env != "0"
            and b >= int(_os.environ.get("AA_GN_XLA_APPLY_MIN_B", 16)))
        if _xla_apply and quant_scale is None and not emit_amax:
            y = (x32 - mu[:, None, None]) * rstd[:, None, None]
            y = y * scale.astype(jnp.float32)[None, None, :] \
                + bias.astype(jnp.float32)[None, None, :]
            if gelu:
                y = _gelu(y)
            if residual is not None:
                y = residual.astype(jnp.float32) + y
            return y.astype(x.dtype)
        # Small-batch fast path: below AA_GN_FLAT_MAX_B the (T, B, C)-view
        # apply fills only B/16 of each bf16 tile's sublanes (6.25% at
        # MIRAGE's B=1) — normalise the flat (T*B, C) row view instead
        # (same bytes, 100% fill at any B). Needs the precomputed stats of
        # this branch. The turbo extras (quant / emit_amax / q_emit) are
        # supported too, so AA_TURBO_MIN_B + AA_GN_FLAT_MAX_B together can
        # put the int8 MXU path in play at serving batches — that combo was
        # 6.6x SLOWER through the (T, B, C) view (12.5% int8 sublane fill).
        # Unlike the retired AA_GN_ROWS variant there is no in-kernel
        # stats pass to pay for — but it is OFF by default (0) until an
        # on-chip A/B lands: the chip was unreachable when this was built
        # (numerics are equivalence-tested vs the (T, B, C) path).
        flat_max_b = int(_os.environ.get("AA_GN_FLAT_MAX_B", 0))
        if b < min(flat_max_b, 129) and (t_len * b) % 8 == 0 \
                and _flat_tile_ok(t_len, b, c):
            stats2 = jnp.pad(jnp.stack([mu, rstd], axis=0),
                             ((0, 0), (0, 128 - b)))       # (2, 128)
            return _flat_apply_launch(xt, stats2, scale, bias, residual,
                                      gelu=gelu, b=b,
                                      quant_scale=quant_scale,
                                      emit_amax=emit_amax,
                                      q_emit_scale=q_emit_scale)
        stats = jnp.pad(jnp.stack([mu, rstd], axis=-1),
                        ((0, 0), (0, 126)))[None]      # (1, B, 128)
    elif t_len * b * c <= int(_os.environ.get("AA_GN_FUSE_MAX", 8_388_608)):
        # Small tensors: one two-phase launch (launch overhead dominates
        # their traffic); big tensors keep the strided stats + apply pair
        # (the 1/4-rate stats read is worth more than a launch there).
        return _single_launch(xt, scale, bias, residual, quant_scale,
                              gelu=gelu, eps=eps, tile=tile, nt=nt,
                              emit_amax=emit_amax, q_emit_scale=q_emit_scale)
    else:
        partials = pl.pallas_call(
            _stats_kernel_tbc,
            grid=(nst,),
            in_specs=[pl.BlockSpec((tile, b, c),
                                   lambda j, s=stride: (j * s, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, b, 128), lambda j: (j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nst, b, 128), jnp.float32),
            interpret=_interpret(),
            cost_estimate=pl.CostEstimate(
                flops=2 * t_len * b * c // stride, transcendentals=0,
                bytes_accessed=t_len * b * c * x.dtype.itemsize // stride),
        )(xt)
        sums = jnp.sum(partials, axis=0)        # (B, 128); cols 0,1 live
        n = nst * tile * c
        mu = sums[:, 0] / n
        var = jnp.maximum(sums[:, 1] / n - jnp.square(mu), 0.0)
        rstd = jax.lax.rsqrt(var + eps)
        stats = jnp.stack([mu, rstd], axis=-1)  # (B, 2)
        stats = jnp.pad(stats, ((0, 0), (0, 126)))[None]   # (1, B, 128)

    tile_spec = pl.BlockSpec((tile, b, c), lambda j: (j, 0, 0),
                             memory_space=pltpu.VMEM)
    small_specs = [
        pl.BlockSpec((1, b, 128), lambda j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, c), lambda j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, c), lambda j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if quant_scale is not None:
        assert residual is None, "turbo quantise is exclusive with residual"
        qinv = (1.0 / jnp.maximum(quant_scale.astype(jnp.float32), 1e-12))
        qinv = jnp.broadcast_to(qinv, (c,)).reshape(1, 1, c)
        yt = pl.pallas_call(
            functools.partial(_apply_quant_kernel_tbc, gelu=gelu),
            grid=(nt,),
            in_specs=[tile_spec] + small_specs +
                     [pl.BlockSpec((1, 1, c), lambda j: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=tile_spec,
            out_shape=jax.ShapeDtypeStruct((t_len, b, c), jnp.int8),
            interpret=_interpret(),
            cost_estimate=pl.CostEstimate(
                flops=12 * t_len * b * c, transcendentals=t_len * b * c,
                bytes_accessed=t_len * b * c * (x.dtype.itemsize + 1)),
        )(xt, stats, scale.reshape(1, 1, c), bias.reshape(1, 1, c), qinv)
    elif residual is None:
        yt = pl.pallas_call(
            functools.partial(_apply_kernel_tbc, gelu=gelu),
            grid=(nt,),
            in_specs=[tile_spec] + small_specs,
            out_specs=tile_spec,
            out_shape=jax.ShapeDtypeStruct((t_len, b, c), x.dtype),
            interpret=_interpret(),
            input_output_aliases={0: 0},   # x is dead after the apply:
                                           # write y into its buffer
            cost_estimate=pl.CostEstimate(
                flops=10 * t_len * b * c, transcendentals=t_len * b * c,
                bytes_accessed=2 * t_len * b * c * x.dtype.itemsize),
        )(xt, stats, scale.reshape(1, 1, c), bias.reshape(1, 1, c))
    elif emit_amax and q_emit_scale is not None:
        rt = jnp.swapaxes(residual, 0, 1)       # bitcast too
        qinv = (1.0 / jnp.maximum(q_emit_scale.astype(jnp.float32), 1e-12))
        qinv = jnp.broadcast_to(qinv, (c,)).reshape(1, 1, c)
        amax_spec = pl.BlockSpec((1, b, c), lambda j: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
        yt, amax, y8 = pl.pallas_call(
            functools.partial(_apply_res_amax_q_kernel_tbc, gelu=gelu),
            grid=(nt,),
            in_specs=[tile_spec, tile_spec] + small_specs +
                     [pl.BlockSpec((1, 1, c), lambda j: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(tile_spec, amax_spec, tile_spec),
            out_shape=(jax.ShapeDtypeStruct((t_len, b, c), x.dtype),
                       jax.ShapeDtypeStruct((1, b, c), jnp.float32),
                       jax.ShapeDtypeStruct((t_len, b, c), jnp.int8)),
            interpret=_interpret(),
            input_output_aliases={0: 0},
            cost_estimate=pl.CostEstimate(
                flops=14 * t_len * b * c, transcendentals=t_len * b * c,
                bytes_accessed=int(3.25 * t_len * b * c
                                   * x.dtype.itemsize)),
        )(xt, rt, stats, scale.reshape(1, 1, c), bias.reshape(1, 1, c), qinv)
        return (jnp.swapaxes(yt, 0, 1), jnp.max(amax[0], axis=0),
                jnp.swapaxes(y8, 0, 1))
    elif emit_amax:
        rt = jnp.swapaxes(residual, 0, 1)       # bitcast too
        yt, amax = pl.pallas_call(
            functools.partial(_apply_res_amax_kernel_tbc, gelu=gelu),
            grid=(nt,),
            in_specs=[tile_spec, tile_spec] + small_specs,
            out_specs=(tile_spec,
                       pl.BlockSpec((1, b, c), lambda j: (0, 0, 0),
                                    memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((t_len, b, c), x.dtype),
                       jax.ShapeDtypeStruct((1, b, c), jnp.float32)),
            interpret=_interpret(),
            input_output_aliases={0: 0},
            cost_estimate=pl.CostEstimate(
                flops=12 * t_len * b * c, transcendentals=t_len * b * c,
                bytes_accessed=3 * t_len * b * c * x.dtype.itemsize),
        )(xt, rt, stats, scale.reshape(1, 1, c), bias.reshape(1, 1, c))
        return jnp.swapaxes(yt, 0, 1), jnp.max(amax[0], axis=0)   # (C,)
    else:
        rt = jnp.swapaxes(residual, 0, 1)       # bitcast too
        yt = pl.pallas_call(
            functools.partial(_apply_res_kernel_tbc, gelu=gelu),
            grid=(nt,),
            in_specs=[tile_spec, tile_spec] + small_specs,
            out_specs=tile_spec,
            out_shape=jax.ShapeDtypeStruct((t_len, b, c), x.dtype),
            interpret=_interpret(),
            input_output_aliases={0: 0},
            cost_estimate=pl.CostEstimate(
                flops=11 * t_len * b * c, transcendentals=t_len * b * c,
                bytes_accessed=3 * t_len * b * c * x.dtype.itemsize),
        )(xt, rt, stats, scale.reshape(1, 1, c), bias.reshape(1, 1, c))
    return jnp.swapaxes(yt, 0, 1)               # bitcast back
