#!/usr/bin/env python
"""Layout experiments on the ResConvBlock chain.

hlo_stats showed 69 ms/iter of {2,0,1}<->{1,2,0} layout copies between
conv fusions and the GroupNorm/elementwise fusions. Variants, each run as
K reps inside one jit (differential timing):

  nhc      current ResConvBlock (channels-last tensors, NHC conv)
  nch      channels-second: (B, C, T) tensors, NCH conv, GN over (C, T)
  padfree  NHC but conv uses pre-padded slices (no SAME pad inside conv)
  f32gn    NHC with f32 GN statistics only (isolate dtype effects)
"""
import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    bsz, K = args.batch, args.reps

    def fetch(v):
        return float(jnp.abs(jnp.ravel(v)[:8]).sum())

    def timed(f, *xs):
        fetch(f(*xs))
        t0 = time.time()
        for _ in range(3):
            fetch(f(*xs))
        return (time.time() - t0) / 3

    def bench(name, op, x, flops):
        def looped(n):
            return jax.jit(lambda x: jax.lax.fori_loop(
                0, n, lambda i, h: op(h).astype(h.dtype), x))
        dt = max((timed(looped(K), x) - timed(looped(0), x)) / K, 1e-9)
        print(f"{name:<34s} {dt*1e3:8.3f} ms  {flops/dt/1e12:6.1f} TF/s "
              f"({100*flops/dt/197e12:5.1f}% MXU)", flush=True)
        return dt

    for t_len, c in ((65536, 256), (16384, 512)):
        w1 = jax.random.normal(key, (5, c, c), dtype) * 0.02
        w2 = jax.random.normal(key, (5, c, c), dtype) * 0.02
        g1 = jnp.ones((c,), dtype); b1 = jnp.zeros((c,), dtype)
        g2 = jnp.ones((c,), dtype); b2 = jnp.zeros((c,), dtype)
        flops = 2 * 2 * 5 * bsz * t_len * c * c

        def gn(h, g, b):
            mu = jnp.mean(h.astype(jnp.float32), axis=(1, 2), keepdims=True)
            var = jnp.mean(jnp.square(h.astype(jnp.float32)), axis=(1, 2),
                           keepdims=True) - jnp.square(mu)
            out = (h.astype(jnp.float32) - mu) * jax.lax.rsqrt(var + 1e-5)
            return (out * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(h.dtype)

        # --- NHC (current semantics) ---
        def block_nhc(h):
            y = jax.lax.conv_general_dilated(
                h, w1, (1,), "SAME", dimension_numbers=("NHC", "HIO", "NHC"))
            y = nn.gelu(gn(y, g1, b1))
            y = jax.lax.conv_general_dilated(
                y, w2, (1,), "SAME", dimension_numbers=("NHC", "HIO", "NHC"))
            y = nn.gelu(gn(y, g2, b2))
            return h + y
        x = jax.random.normal(key, (bsz, t_len, c), dtype)
        bench(f"nhc     T={t_len} C={c}", block_nhc, x, flops)

        # --- NCH (channels-second, time-minor everywhere) ---
        w1t = jnp.transpose(w1, (0, 1, 2))   # HIO stays
        def gn_nch(h, g, b):
            mu = jnp.mean(h.astype(jnp.float32), axis=(1, 2), keepdims=True)
            var = jnp.mean(jnp.square(h.astype(jnp.float32)), axis=(1, 2),
                           keepdims=True) - jnp.square(mu)
            out = (h.astype(jnp.float32) - mu) * jax.lax.rsqrt(var + 1e-5)
            return (out * g.astype(jnp.float32)[:, None]
                    + b.astype(jnp.float32)[:, None]).astype(h.dtype)

        def block_nch(h):
            y = jax.lax.conv_general_dilated(
                h, w1, (1,), "SAME", dimension_numbers=("NCH", "HIO", "NCH"))
            y = nn.gelu(gn_nch(y, g1, b1))
            y = jax.lax.conv_general_dilated(
                y, w2, (1,), "SAME", dimension_numbers=("NCH", "HIO", "NCH"))
            y = nn.gelu(gn_nch(y, g2, b2))
            return h + y
        xc = jax.random.normal(key, (bsz, c, t_len), dtype)
        bench(f"nch     T={t_len} C={c}", block_nch, xc, flops)

        # --- NHC, explicit VALID conv on pre-padded input ---
        def block_padfree(h):
            hp = jnp.pad(h, ((0, 0), (2, 2), (0, 0)))
            y = jax.lax.conv_general_dilated(
                hp, w1, (1,), "VALID", dimension_numbers=("NHC", "HIO", "NHC"))
            y = nn.gelu(gn(y, g1, b1))
            yp = jnp.pad(y, ((0, 0), (2, 2), (0, 0)))
            y = jax.lax.conv_general_dilated(
                yp, w2, (1,), "VALID", dimension_numbers=("NHC", "HIO", "NHC"))
            y = nn.gelu(gn(y, g2, b2))
            return h + y
        bench(f"padfree T={t_len} C={c}", block_padfree, x, flops)


if __name__ == "__main__":
    main()
