#!/usr/bin/env python
"""Structural deltas on the full decode-UNet forward.

profile_unet2 put per-op MXU at 63-95% but the full forward ran at 43%;
~120 ms is structural. This script measures the full forward under
variants to localise it:
  base        full reference config (depth 14, attn 4)
  noattn      n_attn_layers=0
  xlaconv     force the XLA conv op for c_in<128 too (first conv)
  b32         batch 32

    python tools/profile_unet3.py [--variant base|noattn|xlaconv|b32 ...]
"""
import argparse
import time


def run_variant(name, batch=16):
    import jax
    import jax.numpy as jnp
    from audio_algebra_tpu.models import blocks
    from audio_algebra_tpu.models.dvae import DiffusionDVAE
    from audio_algebra_tpu.utils.params import fast_random_params

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    kwargs = {}
    if name == "noattn":
        kwargs["n_attn_layers"] = 0
    if name == "b32":
        batch = 32

    if name == "xlaconv":
        orig = blocks.conv1d_mm

        def conv_xla(x, kernel, bias, stride=1, dilation=1):
            y = jax.lax.conv_general_dilated(
                x, kernel, window_strides=(stride,), padding="SAME",
                rhs_dilation=(dilation,),
                dimension_numbers=("NHC", "HIO", "NHC"))
            return y + (bias.astype(x.dtype) if bias is not None else 0.0)
        blocks.conv1d_mm = conv_xla

    model = DiffusionDVAE(**kwargs)
    params = fast_random_params(model, 0, jnp.zeros((1, 2, 65536)),
                                jnp.zeros((1,)))
    params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
    x = jax.random.normal(key, (batch, 2, 65536), dtype)
    t = jnp.full((batch,), 0.5, dtype)
    cond = jax.random.normal(key, (batch, 64, 512), dtype)

    f = jax.jit(lambda p, x, t, c: model.apply(
        p, x, t, c, method=DiffusionDVAE.decode_v))

    def fetch(v):
        return float(jnp.abs(jnp.ravel(v)[:8]).sum())

    t0 = time.time()
    fetch(f(params, x, t, cond))
    compile_s = time.time() - t0
    t0 = time.time()
    iters = 5
    for _ in range(iters):
        fetch(f(params, x, t, cond))
    dt = (time.time() - t0) / iters
    flops = 1.85e12 * batch
    print(f"{name:<10s} B={batch:<3d} {dt*1e3:8.1f} ms  "
          f"{flops/dt/1e12:6.1f} TF/s ({100*flops/dt/197e12:5.1f}% MXU)  "
          f"compile {compile_s:.0f}s", flush=True)

    if name == "xlaconv":
        blocks.conv1d_mm = orig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", nargs="+",
                    default=["base", "noattn", "xlaconv", "b32"])
    args = ap.parse_args()
    for v in args.variant:
        run_variant(v)


if __name__ == "__main__":
    main()
