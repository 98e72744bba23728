"""Sequence-folded decode UNet (parallel/fold.py) vs the unsharded model.

The fold path — time blocks folded into batch, halo'd convs/resamplers
via block-axis shifts, full-extent GroupNorm stats, unfolded deep
levels — must reproduce the single-program model to float32 tolerance.
This is the single-chip serving path for small batches (the B=1 conv
MXU-occupancy cliff, docs/performance.md "Serving B=1")."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_algebra_tpu.models.unet1d import DiffusionAttnUnet1D
from audio_algebra_tpu.parallel.fold import (
    decode_unet_seqfold, pick_fold_blocks, pick_folded_levels)


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.sqrt(((a - b) ** 2).mean() / max((b ** 2).mean(), 1e-20))


CFGS = [
    # decode-UNet shape class: conditioned, attention on the deepest level
    dict(io_channels=2, cond_dim=4, n_attn_layers=1, c_mults=(8, 8, 16, 16)),
    # unconditioned, no attention (the stacked-LDM outer-stage class)
    dict(io_channels=4, cond_dim=0, n_attn_layers=0, c_mults=(8, 16)),
]


@pytest.mark.slow
@pytest.mark.parametrize("cfg", CFGS, ids=["attn-cond", "plain"])
@pytest.mark.parametrize("n_blocks", [4, 8])
def test_fold_matches_unfolded(cfg, n_blocks):
    t_len, batch = 512, 2
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

    got = decode_unet_seqfold(params, x, t, cond, n_blocks=n_blocks, **cfg)
    assert got.shape == want.shape
    assert _rel(got, want) < 1e-6, _rel(got, want)


@pytest.mark.slow
def test_fold_b1_and_zero_levels():
    """B=1 (the serving case) and the folded_levels=0 degenerate path."""
    cfg = dict(io_channels=4, cond_dim=8, n_attn_layers=0, c_mults=(8, 16))
    model = DiffusionAttnUnet1D(**cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 256), jnp.float32)
    t = jnp.array([0.5], jnp.float32)
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 16), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, t, cond)
    want = model.apply(params, x, t, cond)

    got = decode_unet_seqfold(params, x, t, cond, **cfg)  # auto n_blocks=16
    assert _rel(got, want) < 1e-6, _rel(got, want)

    got0 = decode_unet_seqfold(params, x, t, cond, folded_levels=0, **cfg)
    assert _rel(got0, want) < 1e-6, _rel(got0, want)


@pytest.mark.slow
def test_cfg_unet_fold_matches_unfolded():
    """UNetCFG1d sequence fold (models/unet_cfg1d.py pick_cfg_fold): the
    conv-only levels run folded (halo convs + full-extent grouped GN);
    attention levels unfolded — output must match the plain forward.
    This is the MIRAGE inner-stage small-batch serving path."""
    from audio_algebra_tpu.models.unet_cfg1d import UNetCFG1d, pick_cfg_fold

    cfg = dict(in_channels=4, channels=16, multipliers=(2, 3, 4),
               factors=(1, 2), num_blocks=(2, 2), attentions=(0, 0, 1),
               attention_heads=2, attention_features=8,
               context_embedding_features=32)
    m = UNetCFG1d(**cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 256), jnp.float32)
    t = jnp.array([0.4], jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 32), jnp.float32)
    params = m.init({"params": jax.random.PRNGKey(0)}, x, t, embedding=emb)

    # CFG path (doubled batch) and unconditioned path
    assert pick_cfg_fold(2, 256, cfg["attentions"], cfg["factors"]) == (8, 2)
    want = m.apply(params, x, t, embedding=emb, embedding_scale=3.0)
    got = m.apply(params, x, t, embedding=emb, embedding_scale=3.0,
                  fold_blocks=1)
    assert got.shape == want.shape
    assert _rel(got, want) < 1e-5, _rel(got, want)

    w2 = m.apply(params, x, t)
    g2 = m.apply(params, x, t, fold_blocks=1)
    assert _rel(g2, w2) < 1e-5, _rel(g2, w2)

    # batch already fills the tile -> fold must no-op
    assert pick_cfg_fold(16, 256, cfg["attentions"], cfg["factors"]) == (1, 0)


@pytest.mark.slow
def test_fold_quantized_close():
    """Turbo int8 inside the fold (exact dynamic amax per conv): the
    quantised forward must stay within the per-conv int8 noise envelope
    of the bf16-fold output — same fidelity class as the turbo decode
    path (BASELINE.md: 1.4% rel RMS end-to-end)."""
    cfg = dict(io_channels=4, cond_dim=8, n_attn_layers=0, c_mults=(8, 16))
    model = DiffusionAttnUnet1D(**cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 1024), jnp.float32)
    t = jnp.array([0.5], jnp.float32)
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 16), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, t, cond)
    want = decode_unet_seqfold(params, x, t, cond, **cfg)

    got = decode_unet_seqfold(params, x, t, cond, quantized=True, **cfg)
    assert got.shape == want.shape
    r = _rel(got, want)
    assert r < 0.05, r            # quantisation noise, not a wrong program
    assert r > 0.0                # and the int8 path actually ran


def test_pickers():
    assert pick_fold_blocks(1) == 16
    assert pick_fold_blocks(4) == 4
    assert pick_fold_blocks(16) == 1
    assert pick_fold_blocks(9) == 2
    # attention boundary respected; local slices stay even and >= 16
    assert pick_folded_levels(32768, 16, 10, attn_start=6) == 6
    assert pick_folded_levels(512, 16, 4, attn_start=3) == 2
    assert pick_folded_levels(512, 64, 4, attn_start=3) == 0
