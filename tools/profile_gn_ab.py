#!/usr/bin/env python
"""A/B the size-thresholded single-launch GN vs the stats/apply pair everywhere, in-context.

Runs the full decode-UNet forward twice per mode (bf16 and turbo int8)
with AA_GN_FUSE_MAX toggled (0 = always two-launch), checks the outputs agree bit-for-bit (same
math, same tile schedule), and prints ms/forward for each combination.
"""
import os
import subprocess
import sys

CASES = [
    ("single+turbo", {"AA_TURBO_INT8": "1"}),
    ("twolaunch+turbo", {"AA_TURBO_INT8": "1", "AA_GN_FUSE_MAX": "0"}),
    ("single+bf16", {}),
    ("twolaunch+bf16", {"AA_GN_FUSE_MAX": "0"}),
]

CHILD = r"""
import time, os, sys
import numpy as np
import jax, jax.numpy as jnp
from audio_algebra_tpu.models.dvae import DiffusionDVAE
from audio_algebra_tpu.utils.params import fast_random_params
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
dtype = jnp.bfloat16
key = jax.random.PRNGKey(0)
batch = 16
model = DiffusionDVAE()
params = fast_random_params(model, 0, jnp.zeros((1, 2, 65536)), jnp.zeros((1,)))
params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
x = jax.random.normal(key, (batch, 2, 65536), dtype)
t = jnp.full((batch,), 0.5, dtype)
cond = jax.random.normal(key, (batch, 64, 512), dtype)
f = jax.jit(lambda p, x, t, c: model.apply(p, x, t, c, method=DiffusionDVAE.decode_v))
def fetch(v):
    return float(jnp.abs(jnp.ravel(v)[:8]).sum())
t0 = time.time(); out = f(params, x, t, cond); fetch(out)
compile_s = time.time() - t0
t0 = time.time()
for _ in range(8):
    fetch(f(params, x, t, cond))
dt = (time.time() - t0) / 8
np.save(sys.argv[1], np.asarray(out[:2, :, :4096], np.float32))
print(f"RESULT {dt*1e3:.2f} ms/forward (compile {compile_s:.0f}s)", flush=True)
"""


def main():
    outs = {}
    for name, env in CASES:
        e = dict(os.environ, **env)
        npy = f"/tmp/gn_ab_{name}.npy"
        r = subprocess.run([sys.executable, "-u", "-c", CHILD, npy],
                           env=e, capture_output=True, text=True, timeout=1500)
        line = [l for l in r.stdout.splitlines() if l.startswith("RESULT")]
        print(f"{name:18s} {line[0][7:] if line else 'FAILED'}", flush=True)
        if not line:
            print(r.stderr[-1500:], flush=True)
            return
        outs[name] = npy

    import numpy as np
    for a, b in (("single+turbo", "twolaunch+turbo"),
                 ("single+bf16", "twolaunch+bf16")):
        xa, xb = np.load(outs[a]), np.load(outs[b])
        rel = float(np.sqrt(np.mean((xa - xb) ** 2)
                            / max(np.mean(xb ** 2), 1e-12)))
        print(f"{a} vs {b}: rel RMS {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
