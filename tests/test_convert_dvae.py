"""Checkpoint conversion test with a synthetic torch-style state dict.

The heavy numeric certification lives in tests/test_convert_parity.py
(torch mirror -> pour -> forward parity). This file keeps two cheap
properties covered: the EMA-prefix remap lands EMA values (not mains), and
garbage state dicts degrade to zero hits with a report instead of raising.
"""
import numpy as np
import jax
import jax.numpy as jnp

from audio_algebra_tpu.models.dvae import DiffusionDVAE
from audio_algebra_tpu.utils.params import fast_random_params
from audio_algebra_tpu.convert import _flat_params
from audio_algebra_tpu.convert_dvae import convert_dvae_state_dict


def _torch_layout(arr: np.ndarray) -> np.ndarray:
    """Inverse of checkpoint.torch_to_flax_array for test construction."""
    if arr.ndim == 3:
        return np.transpose(arr, (2, 1, 0))
    if arr.ndim == 2:
        return np.transpose(arr, (1, 0))
    return arr


def test_convert_dvae_roundtrip():
    model = DiffusionDVAE(latent_dim=8, capacity=4, c_mults=(2, 4), strides=(4, 2),
                          n_attn_layers=0, diffusion_c_mults=(8, 16))
    x = jnp.zeros((1, 2, 1024))
    params = fast_random_params(model, 0, x, jnp.zeros((1,)))

    # Build a torch-style sd from known target values, grouped per module so
    # kinds read correctly (a conv's weight/bias share a name stem; a norm's
    # scale becomes a 1-D .weight with its bias as sibling). EMA prefixes
    # exercise the remap: EMA values must win over deliberately-wrong mains.
    rng = np.random.default_rng(7)
    target = {}
    modules = {}
    for path, shape in _flat_params(params):
        parts = path.split("/")
        top = parts[1] if parts[0] == "params" else parts[0]
        if top not in ("encoder", "diffusion"):
            continue
        parent, leafname = "/".join(parts[:-1]), parts[-1]
        val = rng.standard_normal(shape).astype(np.float32)
        target[path] = val
        modules.setdefault(parent, {})[leafname] = val

    sd = {}
    for parent, leaves in modules.items():
        stem = parent.replace("/", ".").replace("params.", "")
        top = stem.split(".")[0]
        ema_stem = stem.replace(f"{top}.", f"{top}_ema.", 1)
        for leafname, val in leaves.items():
            suffix = "bias" if leafname == "bias" else "weight"
            sd[f"{ema_stem}.{suffix}"] = _torch_layout(val)
            # wrong-valued main twin: the EMA copy must overwrite it
            sd[f"{stem}.{suffix}"] = np.zeros_like(_torch_layout(val))

    converted, hits, misses = convert_dvae_state_dict(sd, params)
    assert hits > 20, hits
    assert len(misses) == 0, misses[:5]

    # every targeted leaf must carry the EMA torch value now
    flat = {"/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path): leaf
            for path, leaf in jax.tree_util.tree_flatten_with_path(converted)[0]}
    matched = sum(
        np.allclose(np.asarray(flat[p]), v, atol=1e-6) for p, v in target.items())
    assert matched == len(target), (matched, len(target))


def test_convert_tolerates_garbage():
    model = DiffusionDVAE(latent_dim=8, capacity=4, c_mults=(2,), strides=(4,),
                          n_attn_layers=0, diffusion_c_mults=(8, 8))
    params = fast_random_params(model, 0, jnp.zeros((1, 2, 256)), jnp.zeros((1,)))
    sd = {"encoder.whatever.weight": np.zeros((3, 3, 3), np.float32),
          "unrelated.thing": np.zeros(5, np.float32)}
    converted, hits, misses = convert_dvae_state_dict(sd, params)
    assert hits == 0 and len(misses) == 1
