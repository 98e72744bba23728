"""Fast parameter initialization without running the model.

flax's `model.init` executes a full forward pass to infer shapes — for the
depth-14 UNet at 65536 samples that is ~1 TFLOP, intolerable on this host
(1 CPU core) and wasteful on device. `fast_random_params` gets the shape
pytree from `jax.eval_shape` (pure tracing, no FLOPs) and fills leaves
host-side: fan-in-scaled normals for kernels, zeros for biases, ones for
norm scales — the standard init family, sufficient for random-weight
operation (real checkpoints overwrite these via checkpoint.py).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def fast_random_params(model, rng_or_seed, *args, dtype=jnp.float32, **kwargs) -> Any:
    """Shape-only init: returns a params pytree matching `model.init(...)`."""
    def _seed_of(key) -> int:
        # derive the host-side fill seed from the PRNG key so two wrappers
        # seeded differently get different random init (seed used to
        # silently fall back to 0 for key/rngs-dict callers)
        try:
            if isinstance(key, np.ndarray):     # host key (utils/prng.py)
                return int(key.ravel()[-1])
            return int(np.asarray(jax.random.key_data(key)).ravel()[-1])
        except Exception:
            return 0

    if isinstance(rng_or_seed, int):
        from .prng import host_key
        rngs = {"params": host_key(rng_or_seed)}
        seed = rng_or_seed
    elif isinstance(rng_or_seed, dict):
        rngs = rng_or_seed
        seed = _seed_of(rngs.get("params")) if "params" in rngs else 0
    else:
        rngs, seed = {"params": rng_or_seed}, _seed_of(rng_or_seed)

    shapes = jax.eval_shape(lambda: model.init(rngs, *args, **kwargs))
    np_rng = np.random.default_rng(seed)

    def fill(path, leaf):
        name = str(getattr(path[-1], "key", path[-1])) if path else ""
        shape = leaf.shape
        if len(shape) == 0:
            return jnp.zeros((), dtype)
        if name in ("bias", "b") or len(shape) == 1:
            lname = name.lower()
            # norm scales and (running) variances start at 1 — zero-filled
            # they annihilate the activations (bn_scale/bn_var in the CLAP
            # towers surfaced this: rsqrt(0+eps)*0 made every embedding 0)
            if "scale" in lname or lname.endswith("var"):
                return jnp.ones(shape, dtype)
            return jnp.zeros(shape, dtype)
        fan_in = int(np.prod(shape[:-1]))
        std = 1.0 / max(np.sqrt(fan_in), 1.0)
        arr = np_rng.standard_normal(shape).astype(np.float32) * std
        return jnp.asarray(arr, dtype)

    return jax.tree_util.tree_map_with_path(fill, shapes)
