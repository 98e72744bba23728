#!/usr/bin/env python
"""Time ONE decode-UNet forward (the bench's inner loop body) in-context.

Fast iteration harness for kernel experiments: compiles just decode_v
(not the whole 35-step pipeline), honors AA_TURBO_INT8 / AA_GN_TILE, and
prints ms/forward. The full bench extrapolates: rt35 ~ audio_sec /
(35 * fwd + encode).
"""
import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from audio_algebra_tpu.models.dvae import DiffusionDVAE
    from audio_algebra_tpu.utils.params import fast_random_params

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    model = DiffusionDVAE()
    params = fast_random_params(model, 0, jnp.zeros((1, 2, 65536)),
                                jnp.zeros((1,)))
    params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
    x = jax.random.normal(key, (args.batch, 2, 65536), dtype)
    t = jnp.full((args.batch,), 0.5, dtype)
    cond = jax.random.normal(key, (args.batch, 64, 512), dtype)
    f = jax.jit(lambda p, x, t, c: model.apply(
        p, x, t, c, method=DiffusionDVAE.decode_v))

    def fetch(v):
        return float(jnp.abs(jnp.ravel(v)[:8]).sum())

    t0 = time.time()
    fetch(f(params, x, t, cond))
    print(f"compile {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(args.iters):
        fetch(f(params, x, t, cond))
    dt = (time.time() - t0) / args.iters
    import os
    print(f"fwd {dt*1e3:.1f} ms/forward  batch={args.batch} "
          f"turbo={os.environ.get('AA_TURBO_INT8')} "
          f"gn_tile={os.environ.get('AA_GN_TILE', '262144')}", flush=True)


if __name__ == "__main__":
    main()
