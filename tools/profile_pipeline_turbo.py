#!/usr/bin/env python
"""xprof trace of the TURBO 3-step sampler pipeline (amax-carry engaged:
step 0 unrolled + 2 loop iterations) and dump hlo_stats. The carry path
only exists inside the sampler loop, so tracing decode_v alone misses it."""
import glob
import os
import sys
import time

os.environ.setdefault("AA_TURBO_INT8", "1")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from audio_algebra_tpu.models.dvae import DiffusionDVAE
    from audio_algebra_tpu.samplers.vddim import sample as vddim_sample
    from audio_algebra_tpu.utils.params import fast_random_params

    dtype = jnp.bfloat16
    batch = 16
    model = DiffusionDVAE()
    params = fast_random_params(model, 0, jnp.zeros((1, 2, 65536)),
                                jnp.zeros((1,)))
    params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
    noise = jax.random.normal(jax.random.PRNGKey(1), (batch, 2, 65536), dtype)
    cond = jax.random.normal(jax.random.PRNGKey(2), (batch, 64, 512), dtype)

    @jax.jit
    def pipe(p, n, c):
        model_fn = lambda xx, tt, aux, cond: model.apply(
            p, xx, tt, cond, q_aux=aux, method=DiffusionDVAE.decode_v_aux)
        return vddim_sample(model_fn, n, 3, 0, c, aux_mode=True)

    def fetch(v):
        return float(jnp.abs(jnp.ravel(v)[:8]).sum())

    t0 = time.time()
    fetch(pipe(params, noise, cond))
    print(f"compile {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    fetch(pipe(params, noise, cond))
    print(f"3-step pipe {time.time()-t0:.2f}s", flush=True)

    logdir = "/tmp/pipe_trace"
    with jax.profiler.trace(logdir):
        for _ in range(2):
            fetch(pipe(params, noise, cond))
    xplanes = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplanes:", xplanes, flush=True)
    if not xplanes:
        sys.exit(1)
    from xprof.convert import raw_to_tool_data
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [max(xplanes, key=os.path.getmtime)], "hlo_stats^", {})
    mode = "wb" if isinstance(data, bytes) else "w"
    with open("/tmp/pipe_hlo_stats.out", mode) as fh:
        fh.write(data)
    print(f"wrote /tmp/pipe_hlo_stats.out ({len(data)} bytes)", flush=True)


if __name__ == "__main__":
    main()
