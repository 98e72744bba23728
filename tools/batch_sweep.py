#!/usr/bin/env python
"""Batch-size sweep of the decode-UNet forward (throughput scaling).

The headline realtime factor is throughput: B * 1.365 s of audio per
35 * t_fwd(B) seconds of compute. If t_fwd scales sub-linearly in B
(fixed dispatch overheads, better MXU utilisation at the small deep
levels), a bigger batch raises the headline directly. The reference
capped B at 8 for CUDA memory (Destructo.ipynb cell 17); the v5e has
16 GB HBM.

    python tools/batch_sweep.py [--reps 6] [--batches 8,16,24,32]
"""
import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--batches", default="8,16,24,32")
    ap.add_argument("--sample-size", type=int, default=65536)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from audio_algebra_tpu.models.dvae import DiffusionDVAE
    from audio_algebra_tpu.utils.params import fast_random_params

    dtype = jnp.bfloat16
    model = DiffusionDVAE()
    T = args.sample_size
    params = fast_random_params(model, 0, jnp.zeros((1, 2, T)), jnp.zeros((1,)))
    params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)

    def fetch(v):
        return float(jnp.abs(jnp.ravel(v)[:8]).sum())

    K = args.reps
    for bsz in [int(b) for b in args.batches.split(",")]:
        x = jax.random.normal(jax.random.PRNGKey(1), (bsz, 2, T), dtype)
        t = jnp.full((bsz,), 0.5, dtype)
        cond = jax.random.normal(jax.random.PRNGKey(2), (bsz, 64, T // 128), dtype)

        def looped(n):
            @jax.jit
            def f(p, h):
                def body(i, hh):
                    return model.apply(p, hh, t, cond,
                                       method=DiffusionDVAE.decode_v).astype(dtype)
                return jax.lax.fori_loop(0, n, body, h)
            return f

        t0 = time.time()
        full = looped(K)
        out = full(params, x); fetch(out)
        compile_s = time.time() - t0
        tt = time.time()
        for _ in range(args.iters):
            fetch(full(params, x))
        t_full = (time.time() - tt) / args.iters
        base = looped(0)
        fetch(base(params, x))
        tt = time.time()
        for _ in range(args.iters):
            fetch(base(params, x))
        t_base = (time.time() - tt) / args.iters
        dt = (t_full - t_base) / K
        rt35 = bsz * (T / 48000) / (35 * dt)
        tfs = 1.85e12 * bsz * dt ** -1 / 1e12
        print(f"B={bsz:3d}  fwd={dt*1e3:7.1f} ms  per-item={dt/bsz*1e3:6.2f} ms"
              f"  implied rt@35={rt35:5.2f}x  {tfs:6.1f} TF/s"
              f"  (compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
