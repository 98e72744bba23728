#!/usr/bin/env python
"""Differential per-op profiling of the decode-UNet hot path.

tools/profile_unet.py showed a ~30 ms per-dispatch floor on the axon relay,
swamping single-op timings. Here each op runs K times inside ONE jit
program (fori_loop, output feeding input so nothing folds away); per-op
cost = (t_K - t_0) / K where t_0 is the same program with zero iterations.

    python tools/profile_unet2.py [--batch 16] [--reps 10]
"""
import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from audio_algebra_tpu.models import blocks as B
    from audio_algebra_tpu.utils.params import fast_random_params

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    bsz, K = args.batch, args.reps

    def fetch(v):
        leaf = jax.tree_util.tree_leaves(v)[0]
        return float(jnp.abs(jnp.ravel(leaf)[:8]).sum())

    def timed(f, *xs):
        out = f(*xs)
        fetch(out)
        t0 = time.time()
        for _ in range(args.iters):
            out = f(*xs)
            fetch(out)
        return (time.time() - t0) / args.iters

    def bench(name, op, x, flops=None, bytes_moved=None):
        """op: x -> same-shape x. Runs K reps in one program."""
        def looped(n):
            def f(x):
                return jax.lax.fori_loop(
                    0, n, lambda i, h: op(h).astype(h.dtype), x)
            return jax.jit(f)
        t_full = timed(looped(K), x)
        t_base = timed(looped(0), x)
        dt = max((t_full - t_base) / K, 1e-9)
        extra = ""
        if flops:
            extra += f" {flops/dt/1e12:6.1f} TF/s ({100*flops/dt/197e12:5.1f}% MXU)"
        if bytes_moved:
            extra += f" {bytes_moved/dt/1e9:6.0f} GB/s"
        print(f"{name:<46s} {dt*1e3:8.3f} ms{extra}", flush=True)
        return dt

    level_shapes = [(65536, 256), (32768, 256), (16384, 512), (8192, 512),
                    (4096, 512), (2048, 512), (1024, 512)]
    print(f"== differential timings, B={bsz}, bf16, reps={K} ==", flush=True)

    results = {}
    for t_len, c in level_shapes:
        x = jax.random.normal(key, (bsz, t_len, c), dtype)
        w5 = (jax.random.normal(key, (5, c, c), dtype) * 0.02)
        conv_flops = 2 * 5 * bsz * t_len * c * c
        act_bytes = bsz * t_len * c * 2

        def xla_conv(h):
            return jax.lax.conv_general_dilated(
                h, w5, window_strides=(1,), padding="SAME",
                dimension_numbers=("NHC", "HIO", "NHC"))
        results[("xla", t_len, c)] = bench(
            f"conv5 xla        T={t_len:<6d} C={c}", xla_conv, x,
            flops=conv_flops, bytes_moved=2 * act_bytes)

        def mm_accum(h):
            xp = jnp.pad(h, ((0, 0), (2, 2), (0, 0)))
            y = None
            for i in range(5):
                s = jax.lax.slice(xp, (0, i, 0), (bsz, i + t_len, c))
                z = jnp.matmul(s, w5[i], preferred_element_type=jnp.float32)
                y = z if y is None else y + z
            return y
        results[("mm", t_len, c)] = bench(
            f"conv5 mm-accum   T={t_len:<6d} C={c}", mm_accum, x,
            flops=conv_flops, bytes_moved=2 * act_bytes)

        def mm_bf16(h):
            xp = jnp.pad(h, ((0, 0), (2, 2), (0, 0)))
            y = None
            for i in range(5):
                s = jax.lax.slice(xp, (0, i, 0), (bsz, i + t_len, c))
                z = jnp.matmul(s, w5[i])
                y = z if y is None else y + z
            return y
        results[("mm16", t_len, c)] = bench(
            f"conv5 mm-bf16acc T={t_len:<6d} C={c}", mm_bf16, x,
            flops=conv_flops, bytes_moved=2 * act_bytes)

        # conv as ONE matmul over concatenated taps (K*C contraction)
        wk = w5.reshape(5 * c, c)

        def mm_concat(h):
            xp = jnp.pad(h, ((0, 0), (2, 2), (0, 0)))
            stacked = jnp.concatenate(
                [jax.lax.slice(xp, (0, i, 0), (bsz, i + t_len, c))
                 for i in range(5)], axis=-1)
            return jnp.matmul(stacked, wk, preferred_element_type=jnp.float32)
        results[("mmcat", t_len, c)] = bench(
            f"conv5 mm-concat  T={t_len:<6d} C={c}", mm_concat, x,
            flops=conv_flops, bytes_moved=2 * act_bytes)

        gn = nn.GroupNorm(num_groups=1)
        gnp = jax.tree_util.tree_map(lambda a: a.astype(dtype), gn.init(key, x))
        results[("gn", t_len, c)] = bench(
            f"groupnorm1       T={t_len:<6d} C={c}",
            lambda h: gn.apply(gnp, h), x, bytes_moved=2 * act_bytes)

        results[("gelu", t_len, c)] = bench(
            f"gelu             T={t_len:<6d} C={c}",
            nn.gelu, x, bytes_moved=2 * act_bytes)

        blk = B.ResConvBlock(c, c)
        bp = fast_random_params(blk, 1, jnp.zeros((1, 8, c), dtype))
        bp = jax.tree_util.tree_map(lambda a: a.astype(dtype), bp)
        results[("blk", t_len, c)] = bench(
            f"ResConvBlock     T={t_len:<6d} C={c}",
            lambda h: blk.apply(bp, h), x, flops=2 * conv_flops)

        ds, us = B.Downsample1d(), B.Upsample1d()
        results[("dsus", t_len, c)] = bench(
            f"down+up pair     T={t_len:<6d} C={c}",
            lambda h: us.apply({}, ds.apply({}, h)), x,
            bytes_moved=3 * act_bytes)

    for t_len in (64, 16):
        c = 512
        x = jax.random.normal(key, (bsz, t_len, c), dtype)
        att = B.SelfAttention1d(n_head=c // 32)
        ap_ = fast_random_params(att, 2, jnp.zeros((1, t_len, c), dtype))
        ap_ = jax.tree_util.tree_map(lambda a: a.astype(dtype), ap_)
        bench(f"attention        T={t_len:<6d} C={c}",
              lambda h: att.apply(ap_, h), x)

    print("done", flush=True)


if __name__ == "__main__":
    main()
