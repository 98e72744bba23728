#!/usr/bin/env python
"""Per-level cost of the real decode UNet via depth truncation.

Builds UNets with c_mults prefixes of the reference config and diffs
successive forward times: cost(depth k) - cost(depth k-1) isolates level
k-1 (its down+up pair at its own T) inside the REAL program, XLA schedule
included. Localises the gap between per-op microbench sums (~265 ms) and
the measured full forward (352 ms) at B=16.
"""
import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from audio_algebra_tpu.models.dvae import DiffusionDVAE
    from audio_algebra_tpu.utils.params import fast_random_params

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    batch = args.batch
    full = [256, 256] + [512] * 12

    def fetch(v):
        return float(jnp.abs(jnp.ravel(v)[:8]).sum())

    prev = 0.0
    for depth in (1, 2, 3, 4, 5, 6, 8, 10, 14):
        c_mults = tuple(full[:depth])
        n_attn = max(0, 4 - (14 - depth))
        model = DiffusionDVAE(n_attn_layers=n_attn,
                              diffusion_c_mults=c_mults)
        params = fast_random_params(model, 0, jnp.zeros((1, 2, 65536)),
                                    jnp.zeros((1,)))
        params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
        x = jax.random.normal(key, (batch, 2, 65536), dtype)
        t = jnp.full((batch,), 0.5, dtype)
        cond = jax.random.normal(key, (batch, 64, 512), dtype)
        f = jax.jit(lambda p, x, t, c: model.apply(
            p, x, t, c, method=DiffusionDVAE.decode_v))
        fetch(f(params, x, t, cond))
        t0 = time.time()
        for _ in range(4):
            fetch(f(params, x, t, cond))
        dt = (time.time() - t0) / 4
        print(f"depth={depth:<3d} attn={n_attn}  {dt*1e3:8.1f} ms  "
              f"(+{(dt-prev)*1e3:7.1f} ms vs prev)", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
