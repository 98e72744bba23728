"""Checkpoint conversion test with a synthetic torch-style state dict."""
import numpy as np
import jax
import jax.numpy as jnp

from audio_algebra_tpu.models.dvae import DiffusionDVAE
from audio_algebra_tpu.utils.params import fast_random_params
from audio_algebra_tpu.convert_dvae import convert_dvae_state_dict, _flat_params


def _torch_layout(name: str, arr: np.ndarray) -> np.ndarray:
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

    # build a torch-style sd from known target values, with EMA prefixes
    rng = np.random.default_rng(7)
    sd = {}
    target = {}
    for path, shape in _flat_params(params):
        top = path.split("/")[1] if path.startswith("params/") else path.split("/")[0]
        if top not in ("encoder", "diffusion"):
            continue
        val = rng.standard_normal(shape).astype(np.float32)
        target[path] = val
        tname = f"{top}_ema.{path.replace('/', '.')}.weight" if len(shape) >= 2 \
            else f"{top}_ema.{path.replace('/', '.')}.bias"
        sd[tname] = _torch_layout(tname, val)

    converted, hits, misses = convert_dvae_state_dict(sd, params)
    assert hits > 20, hits
    assert len(misses) == 0, misses[:5]

    # every targeted leaf must carry the torch value now
    flat = {"/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path): leaf
            for path, leaf in jax.tree_util.tree_flatten_with_path(converted)[0]}
    matched = sum(
        np.allclose(np.asarray(flat[p]), v, atol=1e-6) for p, v in target.items())
    # shape-signature pairing can permute same-shape tensors within a bucket;
    # require the vast majority to land exactly
    assert matched / len(target) > 0.7, (matched, len(target))


def test_convert_tolerates_garbage():
    model = DiffusionDVAE(latent_dim=8, capacity=4, c_mults=(2,), strides=(4,),
                          n_attn_layers=0, diffusion_c_mults=(8, 8))
    params = fast_random_params(model, 0, jnp.zeros((1, 2, 256)), jnp.zeros((1,)))
    sd = {"encoder.whatever.weight": np.zeros((3, 3, 3), np.float32),
          "unrelated.thing": np.zeros(5, np.float32)}
    converted, hits, misses = convert_dvae_state_dict(sd, params)
    assert hits == 0 and len(misses) == 1
