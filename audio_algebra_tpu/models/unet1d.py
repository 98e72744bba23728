"""DiffusionAttnUnet1D — the v-diffusion decoder UNet.

Rebuilds the dance-diffusion UNet the reference vendors, at both call sites:
  * DVAE decoder: io_channels=2, cond_dim=64, n_attn_layers=4,
    c_mults=[256,256]+[512]*12 (depth 14) — reference DiffusionDVAE.py:122-128
  * latent diffusion: io_channels=32, cond_dim=32, n_attn_layers=0,
    c_mults=[512]*10, depth=10 — reference StackedAELatentDiffusionCond.py:202-208

Block-isomorphic with the torch original (the recursive SkipBlock nest of
zqevans' decoders/diffusion_decoder.py, Crowson v-diffusion lineage), so
real checkpoints pour tensor-for-tensor: every level (including the
bottleneck and the outermost) carries SIX ResConvBlocks — a down-stack of 3
and an up-stack of 3 — with optional self-attention after each block in the
deepest n_attn_layers levels. The up-stack's third block reduces to the
NEXT-OUTER level's channel count (c_prev), the bottleneck's up-stack first
block takes c (no skip concat), and the outermost up-stack's third block is
the is_last io head. Skip concat order is [deep, skip] (the torch SkipBlock
cats [main(x), x]). Structure here is an explicit level loop with modules
named in forward order (blk_000, attn_001, ...) so converters can rely on
natural-sort order == forward order.

Timestep enters as 16 Fourier features broadcast along time and concatenated
to the input; the conditioning latents are upsampled to the input length and
concatenated likewise. Everything is static-shape; the whole forward is one
jit program.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import (
    Conv1d, FourierFeatures, ResConvBlock, SelfAttention1d,
    Downsample1d, Upsample1d, timestep_broadcast, upsample_to, turbo_int8,
)


QUANT_CARRY_MARGIN = 1.25   # headroom over the previous step's amax; the
                            # int8 clip absorbs the rare >25% one-step drift


class _Stack3(nn.Module):
    """Three ResConvBlocks with optional self-attention after each — one
    half of a UNet level (the torch SkipBlock packs a down-triplet and an
    up-triplet per level; this is one triplet).

    Returns (x, amax, q_amaxes): in turbo mode the per-channel |x| bound of
    the stack output rides along (free, from each block's GN residual-apply
    kernel) so the next consumer's conv1 can run on the int8 MXU. Attention
    between blocks invalidates the bound, so attn stacks thread None.

    Amax-carry (`q_in`, a pair of the PREVIOUS diffusion step's amaxes for
    block1/block2 outputs): each intra-stack GN residual pass then emits an
    int8 twin on that grid and the next block's conv1 consumes it directly
    — the separate quantize_act pass disappears. q_amaxes returns this
    step's fresh (amax_b1, amax_b2) for the next step's grids."""
    c_mid: int
    c_out: int              # third block's output (c_prev on up stacks)
    attn: bool
    is_last: bool = False   # third block is the io head (outermost up stack)

    @nn.compact
    def __call__(self, x, x_amax=None, q_in=None):
        from .blocks import turbo_batch_ok
        p0 = x[0] if isinstance(x, tuple) else x
        turbo = turbo_int8() and turbo_batch_ok(p0.shape[0])
        emit = turbo and not self.attn
        carry = emit and q_in is not None

        def q_scale(bound):
            return (jnp.maximum(bound.astype(jnp.float32), 1e-6)
                    * QUANT_CARRY_MARGIN / 127.0)

        # modules named m0..m5 in forward order (torch's Sequential
        # interleaves conv blocks and attention; converters rely on
        # natural-sort == forward order)
        b1 = ResConvBlock(self.c_mid, self.c_mid, name="m0")
        if carry:
            x, a1, xq = b1(x, x_amax=x_amax, q_emit_scale=q_scale(q_in[0]))
        else:
            x = b1(x, x_amax=x_amax, emit_amax=emit)
            a1, xq = None, None
            if emit:
                x, a1 = x
        if self.attn:
            x = SelfAttention1d(max(1, self.c_mid // 32), name="m1")(x)
        b2 = ResConvBlock(self.c_mid, self.c_mid, name="m2")
        if carry:
            x, a2, xq = b2(x, x_amax=a1, x_q=xq,
                           q_emit_scale=q_scale(q_in[1]))
        else:
            x = b2(x, x_amax=a1, emit_amax=emit)
            a2 = None
            if emit:
                x, a2 = x
        if self.attn:
            x = SelfAttention1d(max(1, self.c_mid // 32), name="m3")(x)
        x = ResConvBlock(self.c_mid, self.c_out, is_last=self.is_last,
                         name="m4")(x, x_amax=a2, x_q=xq, emit_amax=emit)
        a = None
        if emit:
            x, a = x
        if self.attn and not self.is_last:
            x = SelfAttention1d(max(1, self.c_out // 32), name="m5")(x)
        return x, a, ((a1, a2) if emit else None)


class DiffusionAttnUnet1D(nn.Module):
    io_channels: int = 2
    cond_dim: int = 0
    n_attn_layers: int = 4
    c_mults: Sequence[int] = tuple([256, 256] + [512] * 12)
    depth: int | None = None          # defaults to len(c_mults)
    pqmf_bands: int = 1
    timestep_features: int = 16

    @nn.compact
    def __call__(self, x, t, cond=None, q_aux=None,
                 collect_q_aux: bool = False):
        """x (B, io_channels, T), t (B,), cond (B, cond_dim, n) -> v (B, io_channels, T).

        Amax-carry (turbo): `q_aux` is the tuple of per-stack intra-block
        amaxes this same UNet returned on the PREVIOUS diffusion step
        (`collect_q_aux=True` makes the return (v, q_aux_out)); with it,
        every intra-stack GN residual pass emits an int8 twin for the next
        conv1, deleting the separate quantize_act passes. The v-DDIM scan
        carries the tuple between steps."""
        depth = self.depth or len(self.c_mults)
        c_mults = list(self.c_mults)[:depth]
        n_io = self.io_channels * self.pqmf_bands

        h = jnp.swapaxes(x, -1, -2)                       # (B, T, C)
        t_emb = FourierFeatures(self.timestep_features,
                                name="timestep_embed")(t)
        h = jnp.concatenate([h, timestep_broadcast(t_emb, h.shape[1])], axis=-1)
        if self.cond_dim > 0:
            if cond is None:
                raise ValueError("cond_dim > 0 requires a conditioning signal")
            c = upsample_to(jnp.swapaxes(cond, -1, -2), h.shape[1])
            h = jnp.concatenate([h, c], axis=-1)

        attn_start = depth - self.n_attn_layers           # levels >= this get attention

        # turbo: thread the per-channel |h| bound alongside h. The fixed
        # [1,3,3,1] resample taps are non-negative and sum to 1 (convex
        # combinations per channel), so the bound survives Downsample1d /
        # Upsample1d unchanged; skip concat concatenates the bounds.
        stack_idx = 0
        q_out = []

        def q_in():
            return None if q_aux is None else q_aux[stack_idx]

        # ---- down sweep: 3 blocks per level, downsample between levels
        skips = []
        a = None
        for j in range(depth):
            h, a, q = _Stack3(c_mults[j], c_mults[j], attn=j >= attn_start,
                              name=f"stack_{stack_idx:03d}")(
                h, x_amax=a, q_in=q_in())
            q_out.append(q)
            stack_idx += 1
            if j < depth - 1:
                skips.append((h, a))
                h = Downsample1d()(h)

        # ---- up sweep: bottleneck's up-stack runs immediately (no concat);
        # every outer level consumes (upsampled deep, skip) split-concat
        for j in reversed(range(depth)):
            if j > 0:
                c_out = c_mults[j - 1]
                is_last = False
            else:
                c_out = n_io
                is_last = True
            if j < depth - 1:
                h = Upsample1d()(h)
                h_skip, a_skip = skips.pop()
                # split skip-join: the stack's first conv + skip_proj read
                # (h, h_skip) directly — conv(cat(a,b), W) = conv(a, W_a) +
                # conv(b, W_b) — so the 2C concat is never materialised
                # (param shapes unchanged; measured 4.9 ms/forward of pure
                # concatenate traffic at B=16)
                a_pair = (a, a_skip) \
                    if a is not None and a_skip is not None else None
                h, a = (h, h_skip), a_pair
            h, a, q = _Stack3(c_mults[j], c_out, attn=j >= attn_start,
                              is_last=is_last,
                              name=f"stack_{stack_idx:03d}")(
                h, x_amax=a, q_in=q_in())
            q_out.append(q)
            stack_idx += 1

        out = jnp.swapaxes(h, -1, -2)
        if collect_q_aux:
            return out, tuple(q_out)
        return out
