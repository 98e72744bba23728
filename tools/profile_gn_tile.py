#!/usr/bin/env python
"""Microbench the fused GN kernels vs tile size / variant on the real chip.

The turbo-forward trace shows the big GN apply kernels sustaining only
~563 GB/s (residual variant ~356 GB/s effective) against a ~800 GB/s
roofline, and ~39 ms/forward spread over ~500 small deep-level kernels —
launch/pipeline overhead, not bandwidth. This sweeps the tile cap and the
one-launch two-phase variant to pick the production settings.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from audio_algebra_tpu.ops.pallas import groupnorm as pgn

    key = jax.random.PRNGKey(0)

    def fetch(v):
        return float(jnp.abs(jnp.ravel(v)[:8]).sum())

    def timed(f, *xs):
        fetch(f(*xs))
        t0 = time.time()
        for _ in range(args.iters):
            fetch(f(*xs))
        return (time.time() - t0) / args.iters

    shapes = [
        (16, 65536, 256),   # level 0
        (16, 16384, 512),   # level 2
        (16, 2048, 512),    # level 5 (small-kernel band)
        (16, 512, 512),     # level 7
    ]
    for b, t_len, c in shapes:
        x = jax.random.normal(key, (b, t_len, c), jnp.bfloat16)
        res = jax.random.normal(key, (b, t_len, c), jnp.bfloat16)
        scale = jnp.ones((c,), jnp.bfloat16)
        bias = jnp.zeros((c,), jnp.bfloat16)
        nbytes = b * t_len * c * 2
        for cap in (262_144, 524_288, 1_048_576, 2_097_152):
            pgn.MAX_TILE_ELEMS = cap
            f = jax.jit(lambda x, s, bi, r: pgn.groupnorm1_gelu_btc(
                x, s, bi, residual=r, stats_stride=4, emit_amax=True)[0])
            dt = timed(f, x, scale, bias, res)
            # traffic: stats .25R + x R + res R + out W  (aliased over x)
            gb = nbytes * 3.25 / 1e9
            print(f"({b},{t_len},{c}) cap={cap:>8d}: {dt*1e3:7.3f} ms  "
                  f"{gb/dt:6.0f} GB/s", flush=True)
        print()


if __name__ == "__main__":
    main()
