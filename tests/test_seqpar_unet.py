"""Sequence-parallel decode UNet (parallel/infer.py) vs the unsharded model.

The full DiffusionAttnUnet1D forward — entry concat, sharded outer levels
(halo convs, psum GroupNorm stats, halo'd stride-2 resamplers), the
replicated attention core, re-scatter, sharded up sweep with local skips —
must reproduce the single-program model to float32 tolerance on the
virtual 8-device mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_algebra_tpu.models.unet1d import DiffusionAttnUnet1D
from audio_algebra_tpu.parallel.mesh import make_mesh
from audio_algebra_tpu.parallel.infer import (
    decode_unet_seqpar, pick_sharded_levels)


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.sqrt(((a - b) ** 2).mean() / max((b ** 2).mean(), 1e-20))


CFGS = [
    # decode-UNet shape class: conditioned, attention on the deepest level,
    # channel boundary between levels
    dict(io_channels=2, cond_dim=4, n_attn_layers=1, c_mults=(8, 8, 16, 16)),
    # unconditioned, no attention (the stacked-LDM class)
    dict(io_channels=4, cond_dim=0, n_attn_layers=0, c_mults=(8, 16)),
]


@pytest.mark.slow
@pytest.mark.parametrize("cfg", CFGS, ids=["attn-cond", "plain"])
def test_seqpar_matches_unsharded(cfg):
    t_len, batch, shards = 512, 2, 4
    model = DiffusionAttnUnet1D(**cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (batch, cfg["io_channels"], t_len), jnp.float32)
    t = jnp.array([0.3, 0.8], jnp.float32)
    cond = None
    if cfg["cond_dim"]:
        cond = jax.random.normal(jax.random.PRNGKey(2),
                                 (batch, cfg["cond_dim"], 16), jnp.float32)
    params = model.init(rng, x, t, cond)
    want = model.apply(params, x, t, cond)

    mesh = make_mesh(n_devices=shards, axis_names=("seq",))
    got = decode_unet_seqpar(params, x, t, cond, mesh=mesh, axis="seq",
                             **cfg)
    assert got.shape == want.shape
    assert _rel(got, want) < 1e-6, _rel(got, want)


@pytest.mark.slow
def test_seqpar_replicated_fallback_and_auto_levels():
    """sharded_levels=0 (fully replicated core) must also agree, and the
    auto level picker must respect the attention boundary."""
    cfg = CFGS[0]
    t_len = 512
    model = DiffusionAttnUnet1D(**cfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 2, t_len), jnp.float32)
    t = jnp.array([0.5], jnp.float32)
    cond = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 16), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, t, cond)
    want = model.apply(params, x, t, cond)

    mesh = make_mesh(n_devices=8, axis_names=("seq",))
    got = decode_unet_seqpar(params, x, t, cond, mesh=mesh, axis="seq",
                             sharded_levels=0, **cfg)
    assert _rel(got, want) < 1e-6

    depth = len(cfg["c_mults"])
    attn_start = depth - cfg["n_attn_layers"]
    j = pick_sharded_levels(t_len, 8, depth, attn_start)
    assert 0 < j <= attn_start
    # every sharded level keeps an even local slab
    for lvl in range(j):
        assert (t_len >> lvl) % (2 * 8) == 0


def test_seqpar_under_jit():
    """The whole sharded forward must trace into one jit program."""
    cfg = CFGS[1]
    model = DiffusionAttnUnet1D(**cfg)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 4, 256), jnp.float32)
    t = jnp.array([0.1, 0.9], jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, t, None)
    mesh = make_mesh(n_devices=4, axis_names=("seq",))

    @jax.jit
    def run(params, x, t):
        return decode_unet_seqpar(params, x, t, None, mesh=mesh,
                                  axis="seq", **cfg)

    want = model.apply(params, x, t, None)
    got = run(params, x, t)
    assert _rel(got, want) < 1e-6


@pytest.mark.slow
def test_dvae_decode_seqpar_matches_decode():
    """The wrapper-level seq-par diffusion decode (DVAEWrapper.decode_seqpar)
    must reproduce the single-program decode() — same stored noise, same
    crash-schedule sampler, UNet time-sharded over 4 shards."""
    from audio_algebra_tpu.given_models import DVAEWrapper

    w = DVAEWrapper(args_dict={"sample_size": 2048, "latent_dim": 8,
                               "demo_steps": 3},
                    model_kwargs=dict(capacity=4, c_mults=(2, 4),
                                      strides=(4, 2), n_attn_layers=1,
                                      diffusion_c_mults=(8, 16, 16)),
                    debug=False)
    audio = np.random.default_rng(0).standard_normal((2, 2, 2048)) \
        .astype(np.float32)
    reps = w.encode(jnp.asarray(audio))
    want = w.decode(reps)
    mesh = make_mesh(n_devices=4, axis_names=("seq",))
    got = w.decode_seqpar(reps, mesh)
    assert got.shape == want.shape
    assert _rel(got, want) < 1e-5, _rel(got, want)
    # an explicit sharded_levels must compile its OWN program (the cache
    # key carries it — a stale closure would silently ignore the knob)
    n_cached = len(w._jit_cache)
    got1 = w.decode_seqpar(reps, mesh, sharded_levels=1)
    assert len(w._jit_cache) == n_cached + 1
    assert _rel(got1, want) < 1e-5, _rel(got1, want)


@pytest.mark.slow
def test_clapdae_generate_seqpar_matches_generate():
    """MIRAGE's outer stage sequence-parallel (CLAPDAE.generate_seqpar)
    must reproduce generate() exactly under the same starting PRNG key
    (same draw order: inner noise, stage-1 noise, sampler key)."""
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_given_models import TINY_CLAPDAE
    from audio_algebra_tpu.given_models import CLAPDAE

    w = CLAPDAE(**TINY_CLAPDAE)
    w.demo_samples = 4096
    emb = jax.random.normal(jax.random.PRNGKey(9), (1, 1, 512), jnp.float32)
    emb = emb / jnp.linalg.norm(emb)

    w._ensure_params()              # param init draws keys; do it up front
    w._key = jax.random.PRNGKey(42)
    want, want_lat = w.generate(emb, cfg_scales=2, demo_steps=2,
                                outer_steps=3)
    mesh = make_mesh(n_devices=4, axis_names=("seq",))
    w._key = jax.random.PRNGKey(42)
    got, got_lat = w.generate_seqpar(emb, mesh, cfg_scales=2, demo_steps=2,
                                     outer_steps=3)
    assert got.shape == want.shape
    assert _rel(got_lat, want_lat) < 1e-6      # identical inner stage
    assert _rel(got, want) < 1e-5, _rel(got, want)
