#!/usr/bin/env python
"""Capture an xprof trace of the decode-UNet forward and dump XLA's per-op
time breakdown (ground truth for where the 350 ms goes)."""
import glob
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    from audio_algebra_tpu.models.dvae import DiffusionDVAE
    from audio_algebra_tpu.utils.params import fast_random_params

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    batch = 16
    model = DiffusionDVAE()
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

    fetch(f(params, x, t, cond))       # compile outside the trace
    logdir = "/tmp/unet_trace"
    with jax.profiler.trace(logdir):
        for _ in range(3):
            fetch(f(params, x, t, cond))
    print("trace captured", flush=True)

    xplanes = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplanes, flush=True)
    if not xplanes:
        sys.exit(1)
    from xprof.convert import raw_to_tool_data
    for tool in ("hlo_stats", "framework_op_stats", "op_profile"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                [xplanes[-1]], tool + "^", {})
            out = f"/tmp/unet_{tool}.out"
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(out, mode) as fh:
                fh.write(data)
            print(f"wrote {out} ({len(data)} bytes)", flush=True)
        except Exception as e:
            print(f"{tool}: {e}", flush=True)


if __name__ == "__main__":
    main()
