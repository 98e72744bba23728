"""UNetCFG1d — CLAP-conditioned latent-diffusion UNet with CFG.

Rebuilds the capability of archinet audio_diffusion_pytorch 0.0.97's
UNetCFG1d at the reference's "songs" configuration: in_channels 32, context
embedding 512x1, channels 256, multipliers [2,3,4,4,4,4], factors
[1,2,2,4,4], num_blocks [3]*5, attentions [0,0,2,2,2,2], 16 heads x 64
features, rel-pos buckets 256 / max distance 2048, skip scaling, context
time (reference StackedAELatentDiffusionCond.py:297-317).

Classifier-free guidance contract matches the reference call sites:
  * training: `embedding_mask_proba=0.1` randomly swaps the conditioning
    embedding for a learned null ("fixed") embedding per batch element
    (reference StackedAELatentDiffusionCond.py:382).
  * sampling: `embedding_scale=s` runs cond + null in ONE doubled batch
    (2x batch, one program — the TPU-friendly CFG) and returns
    null + s*(cond-null) (reference mirage.py demo_steps path).

Self-attention uses T5-style bucketed relative position bias; cross-attention
attends to the (B, L, 512) context. Time enters as a sinusoidal embedding ->
MLP -> per-block scale/shift.
"""
from __future__ import annotations

import math
import os
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import Conv1d


class TransposedBias(NamedTuple):
    """A hoisted rel-pos bias stored TRANSPOSED — (H, S, T) — for the
    flash kernels (whose score tiles are (kv, q)-oriented). An explicit
    wrapper, not a convention: RelPosSelfAttention dispatches on the type,
    so a plain (H, T, S) array can never be fed to the kernel in the
    wrong orientation. NamedTuple = transparent pytree (rides through
    jit/scan as a leaf container)."""
    arr: jnp.ndarray


def _serving_flash_bias(t: int) -> bool:
    """Shared hoist-time gate: store a site's bias transposed iff the
    serving flash path will consume it (same predicate as the module)."""
    from ..ops.pallas.flash_attention import flash_ok
    mode = os.environ.get("AA_FLASH_ATTN", "auto")
    on_tpu = jax.default_backend() not in ("cpu",)
    return flash_ok(t) and (
        mode in ("1", "interpret") or (mode == "auto" and on_tpu))


def sinusoidal_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half) / half)
    ang = t[:, None] * freqs[None, :] * 1000.0
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


# ---- sequence folding (small-batch serving) --------------------------------
# Same trick as parallel/fold.py for the decode UNet: at B=1 the CFG-doubled
# inner forward runs its convs with 2 sublane rows of a 16-row tile — fold
# time blocks into batch to refill them. Only the conv-only levels fold
# (attention mixes time globally); resample convs at level boundaries run
# unfolded (unfold/refold are free row-major reshapes). SAME padding becomes
# a halo exchange between neighbouring blocks with zero edge fill —
# bit-identical windows to SAME over the unfolded sequence.

def _fold_halo(x4: jnp.ndarray, halo: int) -> jnp.ndarray:
    """(B, n, T_local, C): append `halo` edge samples from each neighbour
    block along T_local; outermost blocks zero-fill (== SAME padding)."""
    if halo == 0:
        return x4
    left = jnp.pad(x4[:, :-1, x4.shape[2] - halo:, :],
                   ((0, 0), (1, 0), (0, 0), (0, 0)))
    right = jnp.pad(x4[:, 1:, :halo, :], ((0, 0), (0, 1), (0, 0), (0, 0)))
    return jnp.concatenate([left, x4, right], axis=2)


def _fold_conv(conv_mod, x4: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Apply a VALID stride-1 Conv1d module to the halo'd folded view."""
    b, n, tl, _ = x4.shape
    xh = _fold_halo(x4, (kernel_size - 1) // 2)
    y = conv_mod(xh.reshape(b * n, xh.shape[2], xh.shape[3]))
    return y.reshape(b, n, tl, y.shape[-1])


def pick_cfg_fold(batch: int, t_len: int, attentions: Sequence[int],
                  factors: Sequence[int], min_local: int = 16,
                  target_rows: int = 16):
    """(n_blocks, folded_levels) for the UNetCFG1d fold: fold until the
    first attention level, keeping every folded level's local slice even
    and >= min_local through its resample factor."""
    n = 1
    while batch * n < target_rows:
        n *= 2
    if n == 1:
        return 1, 0
    k, tl = 0, t_len // n
    if t_len % n:
        return 1, 0
    while (k < len(attentions) and attentions[k] == 0
           and k < len(factors) and tl % factors[k] == 0
           and tl // factors[k] >= min_local):
        tl //= factors[k]
        k += 1
    return (n, k) if k > 0 else (1, 0)


def _relative_position_bucket(rel_pos, num_buckets: int, max_distance: int):
    """T5 bidirectional relative-position bucketing."""
    num_buckets //= 2
    ret = jnp.where(rel_pos > 0, num_buckets, 0)
    n = jnp.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def toeplitz_rel_pos_bias(bias_table: jnp.ndarray, t: int,
                          num_buckets: int, max_distance: int,
                          transposed: bool = False) -> jnp.ndarray:
    """(num_buckets, H) bucket table -> (H, T, T) rel-pos bias by the
    pad-reshape "skew" trick. The bias is Toeplitz: bias[t,s] =
    table[bucket(s-t)] depends on s-t only, so gather just the (2T-1, H)
    diagonal profile and expand it. The naive (T, T, H) gather + transpose
    was 48% of the whole MIRAGE inner step at T=1024 (18.9 ms gather +
    7.1 ms layout copy per attention, xprof hlo_stats); this form is two
    dense reshapes at HBM bandwidth and builds directly in the (H, T, S)
    layout. Module-level so the parity test pins THIS code path."""
    heads = bias_table.shape[1]
    delta = jnp.arange(-(t - 1), t)                       # rel = s - t
    if transposed:
        # the TRANSPOSE bias[s, t] via the same skew: flipping the diagonal
        # profile's delta sign gives M[r, c] = table[bucket(r - c)] — used
        # by the flash training kernels, whose score tiles live in (kv, q)
        # orientation so every softmax statistic is a lane-wise row vector
        delta = -delta
    dbuckets = _relative_position_bucket(delta, num_buckets, max_distance)
    diag = bias_table[dbuckets]                           # (2T-1, H)
    if os.environ.get("AA_RELPOS_MODE", "skew") == "gather":
        # one gather from the tiny (H, 2T-1) profile with a constant
        # (T, S) index matrix — a fusible producer, vs the skew's
        # pad/reshape chain that XLA compiles to 32-way dynamic-slice/
        # DUS loops over 64 MB buffers (~9 ms of the 27 ms B=1 inner
        # forward, r2-final trace)
        idx = jnp.arange(t)[None, :] - jnp.arange(t)[:, None] + (t - 1)
        return diag.T[:, idx]                             # (H, T, S)
    prof = jnp.broadcast_to(diag.T[:, None, :],
                            (heads, t, 2 * t - 1))
    prof = jnp.pad(prof, ((0, 0), (0, 0), (0, 1)))
    prof = prof.reshape(heads, 2 * t * t)[:, : t * (2 * t - 1)]
    return prof.reshape(heads, t, 2 * t - 1)[:, :, t - 1:]


class RelPosSelfAttention(nn.Module):
    heads: int
    head_features: int
    num_buckets: int = 256
    max_distance: int = 2048

    @nn.compact
    def __call__(self, x, bias=None):
        b, t, c = x.shape
        inner = self.heads * self.head_features
        h = nn.LayerNorm()(x)
        q = nn.Dense(inner, use_bias=False)(h).reshape(b, t, self.heads, self.head_features)
        k = nn.Dense(inner, use_bias=False)(h).reshape(b, t, self.heads, self.head_features)
        v = nn.Dense(inner, use_bias=False)(h).reshape(b, t, self.heads, self.head_features)
        scale = self.head_features ** -0.5
        bias_table = self.param("rel_pos_bias", nn.initializers.normal(0.02),
                                (self.num_buckets, self.heads))
        bias_provided = bias is not None

        # Differentiable flash path for TRAINING (AA_TRAIN_FLASH=1): the
        # custom-VJP blocked kernels never materialise the (B,H,T,S)
        # scores in forward OR backward — at batch 16/T=1024 the XLA path
        # burns ~1 GB of HBM round-trips per site per direction, and its
        # stored/rematerialised scores are what OOM batch 32
        # (.r4_logs/remat_ab3.log). d(bucket-table) flows through the
        # transposed toeplitz construction's own autodiff.
        tmode = os.environ.get("AA_TRAIN_FLASH", "0")
        if not bias_provided and tmode in ("1", "interpret"):
            from ..ops.pallas.flash_attention import (
                flash_attention_relpos_train, flash_train_ok)
            if flash_train_ok(t):
                biasT = toeplitz_rel_pos_bias(
                    bias_table, t, self.num_buckets, self.max_distance,
                    transposed=True).astype(x.dtype)
                qh = jnp.swapaxes(q, 1, 2)
                kh = jnp.swapaxes(k, 1, 2)
                vh = jnp.swapaxes(v, 1, 2)
                yh = flash_attention_relpos_train(
                    qh, kh, vh, biasT, scale, 512, tmode == "interpret")
                y = jnp.swapaxes(yh, 1, 2).reshape(b, t, inner)
                return x + nn.Dense(c)(y)

        # Blocked (flash) serving path at long T: never materialises the
        # (B,H,T,S) f32 scores in HBM — at the 66 s window's T=3072 one
        # site's scores are ~1.2 GB/step; see ops/pallas/flash_attention.py
        # (measured on the chip: 12.6 -> 4.0 ms/call at (2,16,3072,64)).
        # FORWARD-ONLY: under "auto" it engages only when the caller passed
        # a hoisted TRANSPOSED bias — precompute_rel_biases marks flash-
        # eligible sites with TransposedBias, so training's grad traces
        # (bias=None) always take a differentiable path and the bias
        # orientation can never silently mismatch. AA_FLASH_ATTN: "auto"
        # (default), "0" (off), "1" (force), "interpret" (CPU tests).
        from ..ops.pallas.flash_attention import (flash_attention_relpos,
                                                  flash_ok)
        mode = os.environ.get("AA_FLASH_ATTN", "auto")
        use_flash = flash_ok(t) and (
            mode == "1" or mode == "interpret"
            or (mode == "auto" and isinstance(bias, TransposedBias)))
        if use_flash:
            if isinstance(bias, TransposedBias):
                biasT = bias.arr.astype(x.dtype)
            elif bias is None:
                biasT = toeplitz_rel_pos_bias(
                    bias_table, t, self.num_buckets, self.max_distance,
                    transposed=True).astype(x.dtype)
            else:
                # forced modes handed a plain (H, T, S) bias (tests)
                biasT = jnp.swapaxes(bias, 1, 2).astype(x.dtype)
            qh = jnp.swapaxes(q, 1, 2)                    # (B, H, T, D)
            kh = jnp.swapaxes(k, 1, 2)
            vh = jnp.swapaxes(v, 1, 2)
            yh = flash_attention_relpos(
                qh, kh, vh, biasT, sm_scale=scale,
                interpret=(mode == "interpret"))
            y = jnp.swapaxes(yh, 1, 2).reshape(b, t, inner)
            return x + nn.Dense(c)(y)

        if isinstance(bias, TransposedBias):
            # platform/env changed between hoist and apply — correctness
            # fallback, costs one transpose
            bias = jnp.swapaxes(bias.arr, 1, 2)
        elif bias is None:
            # serving: precompute_rel_biases hoists this out of the
            # sampler loop (loop-invariant; the skew chain otherwise
            # re-runs all 150 steps)
            bias = toeplitz_rel_pos_bias(bias_table, t, self.num_buckets,
                                         self.max_distance)

        att = jnp.einsum("bthd,bshd->bhts", q * scale, k,
                         preferred_element_type=jnp.float32)
        att = att + bias[None]
        att = jax.nn.softmax(att, axis=-1).astype(v.dtype)
        y = jnp.einsum("bhts,bshd->bthd", att, v).reshape(b, t, inner)
        return x + nn.Dense(c)(y)


class CrossAttention(nn.Module):
    heads: int
    head_features: int

    @nn.compact
    def __call__(self, x, context):
        b, t, c = x.shape
        inner = self.heads * self.head_features
        h = nn.LayerNorm()(x)
        ctx = nn.LayerNorm()(context)
        q = nn.Dense(inner, use_bias=False)(h).reshape(b, t, self.heads, self.head_features)
        k = nn.Dense(inner, use_bias=False)(ctx).reshape(b, -1, self.heads, self.head_features)
        v = nn.Dense(inner, use_bias=False)(ctx).reshape(b, -1, self.heads, self.head_features)
        att = jnp.einsum("bthd,bshd->bhts", q * self.head_features ** -0.5, k,
                         preferred_element_type=jnp.float32)
        att = jax.nn.softmax(att, axis=-1).astype(v.dtype)
        y = jnp.einsum("bhts,bshd->bthd", att, v).reshape(b, t, inner)
        return x + nn.Dense(c)(y)


class FeedForward(nn.Module):
    multiplier: int = 4

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = nn.LayerNorm()(x)
        h = nn.Dense(c * self.multiplier)(h)
        h = nn.gelu(h)
        return x + nn.Dense(c)(h)


class TransformerBlock(nn.Module):
    heads: int
    head_features: int
    multiplier: int
    num_buckets: int
    max_distance: int

    @nn.compact
    def __call__(self, x, context, rel_bias=None):
        x = RelPosSelfAttention(self.heads, self.head_features,
                                self.num_buckets, self.max_distance)(
                                    x, bias=rel_bias)
        x = CrossAttention(self.heads, self.head_features)(x, context)
        return FeedForward(self.multiplier)(x)


class GroupNormFoldable(nn.Module):
    """nn.GroupNorm-compatible params ('scale'/'bias', feature-shaped) with
    a trace-time choice of graph: the literal flax GroupNorm (+ FiLM +
    SiLU as separate ops), or the folded per-(B, C) affine-planes form
    (AA_LDM_GN=1; ops/pallas/groupnorm_grouped.py) that keeps the big
    tensor out of XLA's GroupNorm layout pattern. Checkpoints are
    identical either way."""
    groups: int

    @nn.compact
    def __call__(self, x, film_scale=None, film_shift=None, silu=True):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if x.ndim == 4:
            # folded (B, n, T_local, C) view: statistics over the FULL
            # (n, T_local, C/g) extent per (batch, group) — identical to
            # the unfolded (T, C/g) reduction
            b, n, tl, _ = x.shape
            xg = x.astype(jnp.float32).reshape(b, n, tl, self.groups,
                                               c // self.groups)
            mu = xg.mean(axis=(1, 2, 4), keepdims=True)
            var = jnp.square(xg).mean(axis=(1, 2, 4), keepdims=True) \
                - jnp.square(mu)
            h = ((xg - mu) * jax.lax.rsqrt(var + 1e-6)) \
                .reshape(b, n, tl, c).astype(x.dtype)
        else:
            from ..ops.pallas.groupnorm_grouped import (grouped_gn_film_silu,
                                                        supported)
            if os.environ.get("AA_LDM_GN", "0") == "1" \
                    and supported(x.shape, self.groups):
                return grouped_gn_film_silu(
                    x, scale, bias, self.groups,
                    film_scale=film_scale, film_shift=film_shift, silu=silu)
            h = nn.GroupNorm(num_groups=self.groups, use_scale=False,
                             use_bias=False)(x)
        # keep the activation dtype: f32 scale/bias params would otherwise
        # promote bf16 activations to f32 for every downstream conv
        h = h * scale.astype(h.dtype) + bias.astype(h.dtype)
        if film_scale is not None:
            h = h * (1 + film_scale)
        if film_shift is not None:
            h = h + film_shift
        return nn.silu(h) if silu else h


class ResnetBlock(nn.Module):
    features: int
    groups: int = 8

    @nn.compact
    def __call__(self, x, time_emb):
        """x (B, T, C) — or the folded (B, n, T_local, C) serving view,
        where the convs halo-exchange between blocks and the norms reduce
        over the full (n, T_local, C/g) extent (same numbers, fuller
        sublane tiles at small batch)."""
        folded = x.ndim == 4
        conv1 = Conv1d(self.features, kernel_size=3,
                       padding="VALID" if folded else "SAME")
        conv2 = Conv1d(self.features, kernel_size=3,
                       padding="VALID" if folded else "SAME")
        h = GroupNormFoldable(self.groups, name="GroupNorm_0")(x)
        h = _fold_conv(conv1, h, 3) if folded else conv1(h)
        # per-block time scale/shift
        ts = nn.Dense(2 * self.features)(nn.silu(time_emb))
        ts = ts[:, None, None, :] if folded else ts[:, None, :]
        scale, shift = jnp.split(ts, 2, axis=-1)
        h = GroupNormFoldable(self.groups, name="GroupNorm_1")(
            h, film_scale=scale, film_shift=shift)
        h = _fold_conv(conv2, h, 3) if folded else conv2(h)
        skip = x if x.shape[-1] == self.features else nn.Dense(self.features,
                                                               use_bias=False)(x)
        return skip + h


class _UNetCore(nn.Module):
    """The UNet body (single compact trace); called once per forward, with a
    doubled batch when CFG sampling."""
    cfg: "UNetCFG1d"

    @nn.compact
    def __call__(self, x, t, context, rel_biases=None, fold=(1, 0)):
        cfg = self.cfg
        n_levels = len(cfg.multipliers)
        rel_biases = rel_biases or {}
        n_fold, k_fold = fold            # blocks, folded level count

        if cfg.use_context_time:
            emb = sinusoidal_embedding(t, cfg.channels)
            emb = nn.Dense(4 * cfg.channels, name="time_mlp1")(emb)
            emb = nn.silu(emb)
            time_emb = nn.Dense(4 * cfg.channels, name="time_mlp2")(emb)
        else:
            time_emb = jnp.zeros((x.shape[0], 4 * cfg.channels), x.dtype)

        h = jnp.swapaxes(x, -1, -2)                         # (B, T, C)
        b, t_len, _ = h.shape

        def refold(h3):                  # (B, T, C) -> (B, n, T/n, C), free
            return h3.reshape(b, n_fold, h3.shape[1] // n_fold, h3.shape[2])

        def unfold(h4):                  # inverse, also free
            return h4.reshape(b, h4.shape[1] * h4.shape[2], h4.shape[3])

        init_conv = Conv1d(cfg.channels * cfg.multipliers[0], kernel_size=7,
                           padding="VALID" if k_fold else "SAME",
                           name="init_conv")
        h = _fold_conv(init_conv, refold(h), 7) if k_fold else init_conv(h)

        # AA_LDM_REMAT=1: per-block gradient rematerialisation — store only
        # block INPUTS on the forward pass and recompute block internals
        # during the backward. Activation memory drops from O(all blocks) to
        # O(one block), buying larger training batches for ~1 extra forward
        # of FLOPs (the reference has no equivalent: torch keeps every
        # activation and caps the GPU batch instead). Trace-time flag:
        # training-only knob, no effect on inference numerics or params.
        remat = os.environ.get("AA_LDM_REMAT", "0") == "1"
        Res = nn.remat(ResnetBlock) if remat else ResnetBlock
        Attn = nn.remat(TransformerBlock, static_argnums=()) if remat \
            else TransformerBlock

        def level(h, i, stage):
            feats = cfg.channels * cfg.multipliers[i]
            for j in range(cfg.num_blocks[i] if i < len(cfg.num_blocks) else 1):
                h = Res(feats, cfg.resnet_groups,
                        name=f"{stage}_res{i}_{j}")(h, time_emb)
            for j in range(cfg.attentions[i]):
                h = Attn(
                    cfg.attention_heads, cfg.attention_features,
                    cfg.attention_multiplier,
                    cfg.attention_rel_pos_num_buckets,
                    cfg.attention_rel_pos_max_distance,
                    name=f"{stage}_attn{i}_{j}")(
                        h, context,
                        rel_bias=rel_biases.get(f"{stage}_attn{i}_{j}"))
            return h

        skips = []
        for i in range(n_levels - 1):
            h = level(h, i, "down")      # 4D for i < k_fold
            skips.append(h)
            f = cfg.factors[i]
            # resample convs run UNFOLDED (negligible FLOP share; unfold/
            # refold are free reshapes), except the stride-1 k=3 case
            # which folds like any other conv
            if f > 1:
                if i < k_fold:
                    h = unfold(h)
                h = Conv1d(cfg.channels * cfg.multipliers[i + 1],
                           kernel_size=f * cfg.kernel_multiplier_downsample,
                           stride=f, name=f"down_conv{i}")(h)
                if i + 1 < k_fold:
                    h = refold(h)
            else:
                dc = Conv1d(cfg.channels * cfg.multipliers[i + 1],
                            kernel_size=3,
                            padding="VALID" if i < k_fold else "SAME",
                            name=f"down_conv{i}")
                h = _fold_conv(dc, h, 3) if i < k_fold else dc(h)
                if i < k_fold and i + 1 >= k_fold:
                    h = unfold(h)

        h = level(h, n_levels - 1, "mid")

        for i in reversed(range(n_levels - 1)):
            f = cfg.factors[i]
            if f > 1:
                if i + 1 < k_fold:       # deeper level still folded
                    h = unfold(h)
                # transpose_kernel=True == torch conv_transpose1d semantics
                # (soundstream.py has the same note): real checkpoints pour
                # without kernel-flipped resampling artifacts
                h = nn.ConvTranspose(cfg.channels * cfg.multipliers[i],
                                     (f * cfg.kernel_multiplier_downsample,),
                                     strides=(f,), padding="SAME",
                                     transpose_kernel=True,
                                     name=f"up_conv{i}")(h)
                if i < k_fold:
                    h = refold(h)
            else:
                if i < k_fold and i + 1 >= k_fold:
                    h = refold(h)        # boundary sits at a factor-1 level
                uc = Conv1d(cfg.channels * cfg.multipliers[i],
                            kernel_size=3,
                            padding="VALID" if i < k_fold else "SAME",
                            name=f"up_conv{i}")
                h = _fold_conv(uc, h, 3) if i < k_fold else uc(h)
            skip = skips.pop()
            if cfg.use_skip_scale:
                skip = skip * (2.0 ** -0.5)
            h = jnp.concatenate([h, skip], axis=-1)
            h = level(h, i, "up")

        out_norm = GroupNormFoldable(cfg.resnet_groups, name="out_norm")
        out_conv = Conv1d(cfg.in_channels, kernel_size=7,
                          padding="VALID" if k_fold else "SAME",
                          name="out_conv")
        h = out_norm(h)
        h = unfold(_fold_conv(out_conv, h, 7)) if k_fold else out_conv(h)
        return jnp.swapaxes(h, -1, -2)


class UNetCFG1d(nn.Module):
    in_channels: int = 32
    context_embedding_features: int = 512
    context_embedding_max_length: int = 1
    channels: int = 256
    resnet_groups: int = 8
    kernel_multiplier_downsample: int = 2
    multipliers: Sequence[int] = (2, 3, 4, 4, 4, 4)
    factors: Sequence[int] = (1, 2, 2, 4, 4)
    num_blocks: Sequence[int] = (3, 3, 3, 3, 3)
    attentions: Sequence[int] = (0, 0, 2, 2, 2, 2)
    attention_heads: int = 16
    attention_features: int = 64
    attention_multiplier: int = 4
    attention_rel_pos_max_distance: int = 2048
    attention_rel_pos_num_buckets: int = 256
    use_skip_scale: bool = True
    use_context_time: bool = True

    @nn.compact
    def __call__(self, x, t, embedding=None, embedding_mask_proba: float = 0.0,
                 embedding_scale: float = 1.0, rel_biases=None,
                 fold_blocks: int = 0):
        """x (B, in_channels, T), t (B,), embedding (B, L, 512) -> v (B, in_channels, T).

        fold_blocks > 0 enables the sequence fold on the conv-only levels
        (small-batch serving; pick_cfg_fold chooses the block count from
        the EFFECTIVE batch — doubled under CFG). 0 = off."""
        fixed = self.param("fixed_embedding", nn.initializers.normal(0.02),
                           (self.context_embedding_max_length,
                            self.context_embedding_features))
        b = x.shape[0]
        null_ctx = jnp.broadcast_to(fixed[None], (b, *fixed.shape)).astype(x.dtype)
        if embedding is None:
            context = null_ctx
        else:
            context = embedding.astype(x.dtype)
            if context.shape[0] == 1 and b != 1:
                # one embedding conditioning B variations
                context = jnp.broadcast_to(context[:1], (b, *context.shape[1:]))
            elif context.shape[0] != b:
                raise ValueError(
                    f"embedding batch {context.shape[0]} must be 1 or match "
                    f"x batch {b}")
            if embedding_mask_proba > 0.0:
                keep = jax.random.bernoulli(
                    self.make_rng("cfg"), 1.0 - embedding_mask_proba, (b, 1, 1))
                context = jnp.where(keep, context, null_ctx)

        core = _UNetCore(self, name="core")

        def pick(eff_batch):
            if fold_blocks <= 0:
                return (1, 0)
            return pick_cfg_fold(eff_batch, x.shape[-1], self.attentions,
                                 self.factors)

        if embedding is not None and embedding_scale != 1.0:
            # CFG as ONE doubled batch: [cond | null] -> combine
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            ctx2 = jnp.concatenate([context, null_ctx], axis=0)
            v2 = core(x2, t2, ctx2, rel_biases, fold=pick(2 * b))
            v_cond, v_null = jnp.split(v2, 2, axis=0)
            return v_null + embedding_scale * (v_cond - v_null)
        return core(x, t, context, rel_biases, fold=pick(b))


def precompute_rel_biases(model: "UNetCFG1d", params, t_len: int,
                          dtype=None):
    """Every RelPosSelfAttention site's (H, T, S) bias, built ONCE from
    the param tree — keyed by the site's TransformerBlock module name.

    The bias depends only on params and the static T, so inside a sampler
    it is loop-invariant; XLA will not hoist it itself (the hoisted
    buffers are ~33 MB/site, above its while-loop code-motion appetite),
    so the serving path computes this dict outside the lax.scan and
    passes it via `rel_biases=` — the scan then carries the biases as
    loop constants and the skew construction (~10 ms of the 27 ms B=1
    inner forward, r2-final trace) runs once per generate() instead of
    once per step."""
    p = params["params"] if "params" in params else params
    core = p["core"]
    out = {}

    def site(stage, i, t_i):
        for j in range(model.attentions[i]):
            name = f"{stage}_attn{i}_{j}"
            table = core[name]["RelPosSelfAttention_0"]["rel_pos_bias"]
            # flash-eligible sites hoist the bias PRE-TRANSPOSED (and
            # type-marked) — the kernel's tiles are (kv, q)-oriented and a
            # per-step 600 MB transpose inside the sampler would eat the
            # win. Cast done HERE (not in-step) for the same reason: bf16
            # halves the kernel's only remaining large HBM read.
            flashy = _serving_flash_bias(t_i)
            bias = toeplitz_rel_pos_bias(
                table, t_i, model.attention_rel_pos_num_buckets,
                model.attention_rel_pos_max_distance, transposed=flashy)
            if dtype is not None:
                bias = bias.astype(dtype)
            out[name] = TransposedBias(bias) if flashy else bias

    n_levels = len(model.multipliers)
    t_i = t_len
    for i in range(n_levels - 1):
        site("down", i, t_i)
        t_i //= model.factors[i]
    site("mid", n_levels - 1, t_i)
    for i in reversed(range(n_levels - 1)):
        t_i *= model.factors[i]
        site("up", i, t_i)
    return out
