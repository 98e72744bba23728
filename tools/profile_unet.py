#!/usr/bin/env python
"""Per-component microbenchmark of the DVAE decode UNet hot path.

Times each building block at the exact shapes the Destructo bench hits
(B x 65536 samples, depth-14 UNet, c_mults [256,256]+[512]*12, attention
in the deepest 4 levels), plus alternative conv formulations, so we can
see where the 35-step decode's wall-clock goes and which conv algorithm
wins per shape. Run on the real TPU:

    python tools/profile_unet.py [--batch 16] [--iters 5]
"""
import argparse
import functools
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--full", action="store_true", help="also time the full UNet fwd")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from audio_algebra_tpu.models import blocks as B
    from audio_algebra_tpu.utils.params import fast_random_params

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    def fetch(v):
        leaf = jax.tree_util.tree_leaves(v)[0]
        return float(jnp.abs(jnp.ravel(leaf)[:8]).sum())

    def bench(name, fn, *xs, flops=None, bytes_moved=None):
        f = jax.jit(fn)
        t0 = time.time()
        out = f(*xs)
        fetch(out)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(args.iters):
            out = f(*xs)
            fetch(out)
        dt = (time.time() - t0) / args.iters
        extra = ""
        if flops:
            extra += f" {flops/dt/1e12:6.1f} TF/s ({100*flops/dt/197e12:5.1f}% MXU)"
        if bytes_moved:
            extra += f" {bytes_moved/dt/1e9:6.0f} GB/s"
        print(f"{name:<44s} {dt*1e3:8.2f} ms  (compile {compile_s:5.1f}s){extra}",
              flush=True)
        return dt

    bsz = args.batch
    # ---- hot shapes: (T, C) per level of the depth-14 UNet
    level_shapes = [(65536, 256), (32768, 256), (16384, 512), (8192, 512),
                    (4096, 512), (2048, 512)]

    print(f"== component timings, B={bsz}, bf16 ==", flush=True)

    totals = {}
    for t_len, c in level_shapes:
        x = jax.random.normal(key, (bsz, t_len, c), dtype)
        w5 = jax.random.normal(key, (5, c, c), dtype) * 0.02
        bias = jnp.zeros((c,), dtype)
        conv_flops = 2 * 5 * bsz * t_len * c * c
        gn_bytes = 2 * bsz * t_len * c * 2  # read+write bf16

        # 1. XLA conv op (current path for c>=128)
        def xla_conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, window_strides=(1,), padding="SAME",
                dimension_numbers=("NHC", "HIO", "NHC"))
        bench(f"conv5 xla        T={t_len:<6d} C={c}", xla_conv, x, w5,
              flops=conv_flops)

        # 2. shifted-matmul accumulate (5 matmuls)
        def mm_accum(x, w):
            xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0)))
            y = None
            for i in range(5):
                s = jax.lax.slice(xp, (0, i, 0), (bsz, i + t_len, c))
                z = jnp.matmul(s, w[i], preferred_element_type=jnp.float32)
                y = z if y is None else y + z
            return y.astype(x.dtype)
        bench(f"conv5 mm-accum   T={t_len:<6d} C={c}", mm_accum, x, w5,
              flops=conv_flops)

        # 2b. shifted-matmul accumulate, bf16 accumulation
        def mm_accum16(x, w):
            xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0)))
            y = None
            for i in range(5):
                s = jax.lax.slice(xp, (0, i, 0), (bsz, i + t_len, c))
                z = jnp.matmul(s, w[i])
                y = z if y is None else y + z
            return y
        bench(f"conv5 mm-bf16acc T={t_len:<6d} C={c}", mm_accum16, x, w5,
              flops=conv_flops)

        # 3. GroupNorm(1) as used in ResConvBlock
        gn = nn.GroupNorm(num_groups=1)
        gnp = gn.init(key, x)
        bench(f"groupnorm1       T={t_len:<6d} C={c}",
              lambda p, x: gn.apply(p, x), gnp, x, bytes_moved=gn_bytes)

        # 4. full ResConvBlock (current impl)
        blk = B.ResConvBlock(c, c)
        bp = fast_random_params(blk, 1, jnp.zeros((1, 8, c), dtype))
        bp = jax.tree_util.tree_map(lambda a: a.astype(dtype), bp)
        bench(f"ResConvBlock     T={t_len:<6d} C={c}",
              lambda p, x: blk.apply(p, x), bp, x, flops=2 * conv_flops)

        # 5. down/upsample
        ds = B.Downsample1d()
        us = B.Upsample1d()
        bench(f"downsample       T={t_len:<6d} C={c}",
              lambda x: ds.apply({}, x), x, bytes_moved=gn_bytes * 0.75)

    # attention at the deep levels (T=64..8, C=512)
    for t_len in (64, 32, 16, 8):
        c = 512
        x = jax.random.normal(key, (bsz, t_len, c), dtype)
        att = B.SelfAttention1d(n_head=c // 32)
        ap_ = fast_random_params(att, 2, jnp.zeros((1, t_len, c), dtype))
        ap_ = jax.tree_util.tree_map(lambda a: a.astype(dtype), ap_)
        bench(f"attention        T={t_len:<6d} C={c}",
              lambda p, x: att.apply(p, x), ap_, x)

    if args.full:
        from audio_algebra_tpu.models.dvae import DiffusionDVAE
        from audio_algebra_tpu.samplers.vddim import sample as vddim_sample
        model = DiffusionDVAE()
        params = fast_random_params(model, 0, jnp.zeros((1, 2, 65536)),
                                    jnp.zeros((1,)))
        params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
        x = jax.random.normal(key, (bsz, 2, 65536), dtype)
        t = jnp.full((bsz,), 0.5, dtype)
        cond = jax.random.normal(key, (bsz, 64, 512), dtype)
        # ~1.85 TFLOP per item per fwd (BASELINE.md physics note)
        bench("UNet decode_v single fwd",
              lambda p, x, t, c: model.apply(p, x, t, c,
                                             method=DiffusionDVAE.decode_v),
              params, x, t, cond, flops=1.85e12 * bsz)

    print("done", flush=True)


if __name__ == "__main__":
    main()
