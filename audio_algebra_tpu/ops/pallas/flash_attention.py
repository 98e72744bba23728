"""Blocked (flash) self-attention with an additive rel-pos bias — TPU Pallas.

Why: the CLAPDAE inner UNet (models/unet_cfg1d.py RelPosSelfAttention — the
capability of the reference's rel-pos transformer at
StackedAELatentDiffusionCond.py:312) materialises its (B, H, T, S) f32
score tensor in HBM. At the 66 s window the top attention levels run at
T = 3072/1536 (latents (32, 6144) downsampled), so ONE site's scores are
B·16·3072²·4 B ≈ 1.2 GB at the CFG-doubled serving batch — written, re-read
by the softmax, re-written, re-read by the PV matmul, ~150 sampler steps.
The attention FLOPs are trivial (≈0.4 ms at the MXU's bf16 peak); the wall
is pure HBM traffic.

This kernel never writes scores to HBM: the classic single-pass online-
softmax flash schedule (running row max `m`, normaliser `l`, accumulator
`acc` in VMEM scratch, grid (H, n_q, n_kv) with the kv axis innermost).
Remaining HBM traffic is Q/K/V/O (~50 MB) plus the bias tiles.

The rel-pos bias is Toeplitz (bias[t, s] depends on s−t only), shared
across the batch, and loop-invariant across sampler steps — the serving
path already builds the full (H, T, S) table once per generate()
(precompute_rel_biases). The kernel reads bias TILES from that table in
bf16 with the batch kept INSIDE the block (grid has no batch axis), so
each tile is fetched once per (h, q-block, kv-block) instead of once per
batch row: bias traffic drops 2·(4 B)·B → 2 B per score, and the score
write+read+softmax round-trips disappear entirely. Net ≈10× less HBM
traffic per attention site at T=3072, B=2.

Numerics: scores and softmax statistics in f32 (preferred_element_type on
the QKᵀ MXU op); the P·V matmul runs in the value dtype (bf16 in serving,
matching the rest of the serving pipeline). Forward-only — the serving
path needs no VJP; training batches run the XLA path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _pick_block(b: int, t: int, max_block: int = 512,
                cap: int = 4096) -> int:
    """Largest block with b·block ≤ cap (≥128): the per-program VMEM
    working set scales with b·block (the batch rides INSIDE the block so
    bias tiles are read once per (h, qi, ki), not once per batch row).
    Measured on v5e against the 16 MB budget: fwd at b=16/block 512 hit
    17.19 MB (cap 4096 -> block 256 fits); the dkv backward carries four
    streamed tiles + two f32 accumulators and still hit 16.34 MB at
    b=16/block 256, so the backward kernels use cap 2048."""
    blk = min(max_block, t)
    while b * blk > cap and blk > 128:
        blk //= 2
    while t % blk:
        blk //= 2
    return blk


def flash_ok(t: int, block: int = 512, min_t: int = 1024) -> bool:
    """True when the blocked path applies: long-enough sequence, block-
    divisible. Below min_t the score tensor is small and XLA's fused
    path is already fine (and the fixed kernel overhead isn't paid)."""
    return t >= min_t and t % block == 0


@functools.partial(jax.jit, static_argnames=("sm_scale", "block", "interpret"))
def flash_attention_relpos(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           biasT: jnp.ndarray, *, sm_scale: float = 1.0,
                           block: int = 512,
                           interpret: bool = False) -> jnp.ndarray:
    """q, k, v: (B, H, T, D); biasT: the TRANSPOSED additive bias
    (H, S, T) — toeplitz_rel_pos_bias(..., transposed=True); any float
    dtype (pass bf16 to halve the only remaining large HBM read).
    Returns (B, H, T, D) in q's dtype: softmax(q·kᵀ·sm_scale + bias)·v.

    Same transposed-score kernel as the training path minus any use of
    the residuals (their cost is two (H, B, T) f32 writes, noise)."""
    o, _, _ = _fwd_impl(q, k, v, biasT, sm_scale, block, interpret)
    return o


def flash_attention_relpos_ref(q, k, v, bias, sm_scale: float = 1.0):
    """Unblocked reference for tests: same contract, XLA semantics."""
    s = jnp.einsum("bhtd,bhsd->bhts", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * sm_scale
    s = s + bias.astype(jnp.float32)[None]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", p.astype(v.dtype), v).astype(q.dtype)


# ===================================================================== train
# Differentiable flash attention — the TRAINING memory/bandwidth lever.
#
# Why a second implementation: the CLAPDAE generator trainer
# (train_clapdae.py — the reference's dominant workload,
# StackedAELatentDiffusionCond.py:348-394) runs 14 rel-pos attention sites
# per step; at batch 16 / T=1024 each site's XLA path materialises ~1 GB of
# f32 scores in the forward AND keeps them (or rematerialises them) for the
# backward — measured: batch 32 OOMs even with per-block remat
# (AA_LDM_REMAT=1, .r4_logs/remat_ab3.log), because remat replays the whole
# score tensor inside each block's backward. The flash backward never holds
# more than one (block_kv, block_q) tile of scores.
#
# Layout: every kernel below works on TRANSPOSED score tiles sT = (kv, q),
# so the softmax statistics (m, l) and the delta row are (1, block_q) LANE
# vectors — broadcasting them over (block_kv, block_q) tiles is the native
# VPU pattern, and not a single in-kernel transpose or sublane-broadcast is
# needed anywhere (the accumulator rides as (D, block_q) for the same
# reason; the wrapper swaps the output back once). The rel-pos bias comes
# in PRE-TRANSPOSED as biasT (H, S, T) — toeplitz_rel_pos_bias(...,
# transposed=True), whose autodiff also routes d(biasT) back to the bucket
# table, so the custom_vjp below only has to produce d(biasT).
#
# Backward split is the standard two-kernel schedule: dk/dv accumulate over
# q blocks (grid (H, n_kv, n_q)), dq + d(biasT) accumulate over kv blocks
# (grid (H, n_q, n_kv)); each recomputes its pT tile from q/k/biasT + the
# saved (l, m) — the residuals are 2 · (B, H, T) f32, ~2 MB, vs the XLA
# path's per-site GBs.


def _fwd_kernel_t(q_ref, k_ref, v_ref, biasT_ref, oT_ref, l_ref, m_ref,
                  acc_ref, ms_ref, ls_ref, *, batch: int, sm_scale: float):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        ms_ref[:] = jnp.full_like(ms_ref, NEG_INF)
        ls_ref[:] = jnp.zeros_like(ls_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    biasT = biasT_ref[0].astype(jnp.float32)               # (bk, bq)

    for b in range(batch):
        q = q_ref[b, 0]                                    # (bq, D)
        k = k_ref[b, 0]                                    # (bk, D)
        v = v_ref[b, 0]                                    # (bk, D)
        sT = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        sT = sT * sm_scale + biasT                         # (bk, bq)

        m_prev = ms_ref[b]                                 # (1, bq)
        l_prev = ls_ref[b]
        m_cur = jnp.max(sT, axis=0, keepdims=True)         # (1, bq)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)                    # (1, bq)
        p = jnp.exp(sT - m_new)                            # (bk, bq)
        l_new = l_prev * alpha + jnp.sum(p, axis=0, keepdims=True)
        # accT (D, bq): lane-major on q, so the alpha rescale broadcasts
        pv = jax.lax.dot_general(v, p.astype(v.dtype),
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_ref[b] = acc_ref[b] * alpha + pv               # (D, bq)
        ms_ref[b] = m_new
        ls_ref[b] = l_new

        @pl.when(ki == nk - 1)
        def _():
            oT_ref[b, 0] = (acc_ref[b] / ls_ref[b]).astype(oT_ref.dtype)
            # residuals live as (H, B, T) so the block's trailing dims are
            # (B, bq) — Mosaic requires the last two block dims be 8/128-
            # divisible or whole-array, which a (B, 1, bq) view violates
            l_ref[0, b:b + 1, :] = ls_ref[b]
            m_ref[0, b:b + 1, :] = ms_ref[b]


def _bwd_dkv_kernel_t(q_ref, k_ref, v_ref, biasT_ref, do_ref, l_ref, m_ref,
                      delta_ref, dk_ref, dv_ref, dka_ref, dva_ref,
                      *, batch: int, sm_scale: float):
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _():
        dka_ref[:] = jnp.zeros_like(dka_ref)
        dva_ref[:] = jnp.zeros_like(dva_ref)

    biasT = biasT_ref[0].astype(jnp.float32)               # (bk, bq)

    for b in range(batch):
        q = q_ref[b, 0]                                    # (bq, D)
        k = k_ref[b, 0]                                    # (bk, D)
        v = v_ref[b, 0]                                    # (bk, D)
        do = do_ref[b, 0]                                  # (bq, D)
        m_row = m_ref[0, b:b + 1, :]                       # (1, bq)
        l_row = l_ref[0, b:b + 1, :]
        d_row = delta_ref[0, b:b + 1, :]
        sT = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        sT = sT * sm_scale + biasT
        pT = jnp.exp(sT - m_row) / l_row                   # (bk, bq) probs
        dva_ref[b] += jax.lax.dot_general(
            pT.astype(do.dtype), do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (bk, D)
        dpT = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dsT = pT * (dpT - d_row)                           # (bk, bq)
        dka_ref[b] += sm_scale * jax.lax.dot_general(
            dsT.astype(q.dtype), q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (bk, D)

        @pl.when(qi == nq - 1)
        def _():
            dk_ref[b, 0] = dka_ref[b].astype(dk_ref.dtype)
            dv_ref[b, 0] = dva_ref[b].astype(dv_ref.dtype)


def _bwd_dq_kernel_t(q_ref, k_ref, v_ref, biasT_ref, do_ref, l_ref, m_ref,
                     delta_ref, dq_ref, dbT_ref, dqa_ref,
                     *, batch: int, sm_scale: float):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        dqa_ref[:] = jnp.zeros_like(dqa_ref)

    biasT = biasT_ref[0].astype(jnp.float32)
    dbT_acc = jnp.zeros(dbT_ref.shape[1:], jnp.float32)    # (bk, bq)

    for b in range(batch):
        q = q_ref[b, 0]
        k = k_ref[b, 0]
        v = v_ref[b, 0]
        do = do_ref[b, 0]
        m_row = m_ref[0, b:b + 1, :]
        l_row = l_ref[0, b:b + 1, :]
        d_row = delta_ref[0, b:b + 1, :]
        sT = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        sT = sT * sm_scale + biasT
        pT = jnp.exp(sT - m_row) / l_row
        dpT = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dsT = pT * (dpT - d_row)                           # (bk, bq)
        dbT_acc = dbT_acc + dsT
        dqa_ref[b] += sm_scale * jax.lax.dot_general(
            dsT.astype(k.dtype), k, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (bq, D)

        @pl.when(ki == nk - 1)
        def _():
            dq_ref[b, 0] = dqa_ref[b].astype(dq_ref.dtype)

    dbT_ref[0] = dbT_acc.astype(dbT_ref.dtype)


def _fwd_impl(q, k, v, biasT, sm_scale: float, block: int, interpret: bool):
    b, h, t, d = q.shape
    bq = bk = _pick_block(b, t, block)
    nq, nk = t // bq, t // bk
    kernel = functools.partial(_fwd_kernel_t, batch=b, sm_scale=sm_scale)
    oT, l, m = pl.pallas_call(
        kernel,
        grid=(h, nq, nk),
        in_specs=[
            pl.BlockSpec((b, 1, bq, d), lambda hi, qi, ki: (0, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1, bk, d), lambda hi, qi, ki: (0, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1, bk, d), lambda hi, qi, ki: (0, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, bq), lambda hi, qi, ki: (hi, ki, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, 1, d, bq), lambda hi, qi, ki: (0, hi, 0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, bq), lambda hi, qi, ki: (hi, 0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, bq), lambda hi, qi, ki: (hi, 0, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, d, t), q.dtype),
            jax.ShapeDtypeStruct((h, b, t), jnp.float32),
            jax.ShapeDtypeStruct((h, b, t), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, d, bq), jnp.float32),           # accT
            pltpu.VMEM((b, 1, bq), jnp.float32),           # m
            pltpu.VMEM((b, 1, bq), jnp.float32),           # l
        ],
        interpret=interpret,
    )(q, k, v, biasT)
    o = jnp.swapaxes(oT, 2, 3)                             # (B, H, T, D)
    return o, l, m


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention_relpos_train(q, k, v, biasT, sm_scale: float = 1.0,
                                 block: int = 512, interpret: bool = False):
    """Differentiable blocked attention. q/k/v (B, H, T, D); biasT is the
    TRANSPOSED additive bias (H, S, T) — build it with
    toeplitz_rel_pos_bias(..., transposed=True) so d(biasT) flows back to
    the bucket table through that construction's own autodiff."""
    o, _, _ = _fwd_impl(q, k, v, biasT, sm_scale, block, interpret)
    return o


def _train_fwd(q, k, v, biasT, sm_scale, block, interpret):
    o, l, m = _fwd_impl(q, k, v, biasT, sm_scale, block, interpret)
    return o, (q, k, v, biasT, o, l, m)


def _train_bwd(sm_scale, block, interpret, res, do):
    q, k, v, biasT, o, l, m = res
    b, h, t, d = q.shape
    bq = bk = _pick_block(b, t, block, cap=2048)
    nq, nk = t // bq, t // bk
    # (H, B, T) like l/m — trailing block dims (B, bq) satisfy Mosaic's
    # 8/128-or-whole-array tiling rule
    delta = jnp.transpose(
        jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1),
        (1, 0, 2))

    qkv_spec = lambda ix: pl.BlockSpec((b, 1, bq, d), ix,
                                       memory_space=pltpu.VMEM)
    row_spec = lambda ix: pl.BlockSpec((1, b, bq), ix,
                                       memory_space=pltpu.VMEM)

    dkv_kernel = functools.partial(_bwd_dkv_kernel_t, batch=b,
                                   sm_scale=sm_scale)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(h, nk, nq),
        in_specs=[
            qkv_spec(lambda hi, ki, qi: (0, hi, qi, 0)),   # q
            qkv_spec(lambda hi, ki, qi: (0, hi, ki, 0)),   # k
            qkv_spec(lambda hi, ki, qi: (0, hi, ki, 0)),   # v
            pl.BlockSpec((1, bk, bq), lambda hi, ki, qi: (hi, ki, qi),
                         memory_space=pltpu.VMEM),         # biasT
            qkv_spec(lambda hi, ki, qi: (0, hi, qi, 0)),   # do
            row_spec(lambda hi, ki, qi: (hi, 0, qi)),      # l
            row_spec(lambda hi, ki, qi: (hi, 0, qi)),      # m
            row_spec(lambda hi, ki, qi: (hi, 0, qi)),      # delta
        ],
        out_specs=[
            qkv_spec(lambda hi, ki, qi: (0, hi, ki, 0)),   # dk
            qkv_spec(lambda hi, ki, qi: (0, hi, ki, 0)),   # dv
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, t, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, t, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, bk, d), jnp.float32),           # dk acc
            pltpu.VMEM((b, bk, d), jnp.float32),           # dv acc
        ],
        interpret=interpret,
    )(q, k, v, biasT, do, l, m, delta)

    dq_kernel = functools.partial(_bwd_dq_kernel_t, batch=b,
                                  sm_scale=sm_scale)
    dq, dbT = pl.pallas_call(
        dq_kernel,
        grid=(h, nq, nk),
        in_specs=[
            qkv_spec(lambda hi, qi, ki: (0, hi, qi, 0)),   # q
            qkv_spec(lambda hi, qi, ki: (0, hi, ki, 0)),   # k
            qkv_spec(lambda hi, qi, ki: (0, hi, ki, 0)),   # v
            pl.BlockSpec((1, bk, bq), lambda hi, qi, ki: (hi, ki, qi),
                         memory_space=pltpu.VMEM),         # biasT
            qkv_spec(lambda hi, qi, ki: (0, hi, qi, 0)),   # do
            row_spec(lambda hi, qi, ki: (hi, 0, qi)),      # l
            row_spec(lambda hi, qi, ki: (hi, 0, qi)),      # m
            row_spec(lambda hi, qi, ki: (hi, 0, qi)),      # delta
        ],
        out_specs=[
            qkv_spec(lambda hi, qi, ki: (0, hi, qi, 0)),   # dq
            pl.BlockSpec((1, bk, bq), lambda hi, qi, ki: (hi, ki, qi),
                         memory_space=pltpu.VMEM),         # dbiasT
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
            jax.ShapeDtypeStruct((h, t, t), biasT.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, bq, d), jnp.float32),           # dq acc
        ],
        interpret=interpret,
    )(q, k, v, biasT, do, l, m, delta)

    return dq, dk, dv, dbT


flash_attention_relpos_train.defvjp(_train_fwd, _train_bwd)


def flash_train_ok(t: int, block: int = 512, min_t: int = 512) -> bool:
    """Training gate: the XLA path's score tensors only hurt at long T;
    below min_t the blocked kernels' fixed overhead isn't worth it."""
    return t >= min_t and t % min(block, t) == 0
