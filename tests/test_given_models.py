"""Tests for the given_models wrapper layer (tiny model configs, CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from audio_algebra_tpu.given_models import (
    GivenModelClass, SpectrogramAE, MagSpectrogramAE, MagDPhaseSpectrogramAE,
    MelSpectrogramAE, DVAEWrapper, StackedDiffAEWrapper, DMAE1d, RAVEWrapper,
    CLAPDAE,
)
from audio_algebra_tpu.models.clap import TINY_AUDIO_CFG, TINY_TEXT_CFG


@pytest.fixture(scope="module")
def audio(rng=None):
    rng = np.random.default_rng(0)
    t = np.arange(8192) / 48000
    x = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(8192)
    return np.stack([x, 0.8 * x]).astype(np.float32)   # (2, 8192)


# ------------------------------------------------------ base class --------

def test_base_class_contract():
    g = GivenModelClass()
    assert g.name == "GivenModelClass"
    assert g.encode(None) is None and g.decode(None) is None
    assert g.next_power_of_2(5) == 8 and g.next_power_of_2(8) == 8
    padded = g.zero_pad_po2(jnp.ones((2, 100)))
    assert padded.shape == (2, 128)
    assert float(padded[:, 100:].sum()) == 0.0


def test_match_sizes_both_directions():
    g = GivenModelClass()
    g.orig_shape = (2, 100)
    longer = jnp.ones((2, 120))
    assert g.match_sizes(longer).shape[-1] == 100
    shorter = jnp.ones((2, 80))
    out = g.match_sizes(shorter)
    assert out.shape[-1] == 100 and float(out[:, 80:].sum()) == 0.0


# ------------------------------------------------- spectrogram AEs --------

def test_spectrogram_ae_perfect_recon(audio):
    m = SpectrogramAE()
    reps, recon = m.forward(audio)
    assert np.iscomplexobj(np.asarray(reps))
    assert recon.shape == audio.shape
    err = np.mean((np.asarray(recon) - audio) ** 2) / np.mean(audio**2)
    assert err < 1e-7, err


def test_mag_spectrogram_ae(audio):
    m = MagSpectrogramAE(n_iter=8)
    reps, recon = m.forward(audio)
    assert not np.iscomplexobj(np.asarray(reps))
    assert recon.shape == audio.shape
    # GriffinLim recovers spectral content of a sinusoid reasonably
    assert np.isfinite(np.asarray(recon)).all()


def test_magdphase_ae_roundtrip(audio):
    m = MagDPhaseSpectrogramAE()
    reps, recon = m.forward(audio)
    # 2C channels: mags + dthetas
    assert reps.shape[0] == 2 * audio.shape[0]
    err = np.mean((np.asarray(recon) - audio) ** 2) / np.mean(audio**2)
    assert err < 1e-4, err


def test_magdphase_cheat_mode(audio):
    m = MagDPhaseSpectrogramAE(cheat=True)
    reps, recon = m.forward(audio)
    err = np.mean((np.asarray(recon) - audio) ** 2) / np.mean(audio**2)
    assert err < 1e-6, err     # exact phase => near-perfect


def test_mel_spectrogram_ae(audio):
    m = MelSpectrogramAE(n_mels=64, n_iter=4)
    reps, recon = m.forward(audio)
    assert reps.shape[-2] == 64
    assert recon.shape == audio.shape


# -------------------------------------------------- model wrappers --------

TINY_DVAE = dict(model_kwargs=dict(capacity=4, c_mults=(2, 4), strides=(4, 2),
                                   n_attn_layers=1, diffusion_c_mults=(8, 16, 16)),
                 args_dict={'sample_size': 2048, 'demo_steps': 3, 'latent_dim': 8})


def test_dvae_wrapper_encode_decode():
    w = DVAEWrapper(**TINY_DVAE)
    x = np.random.default_rng(1).standard_normal((2, 2, 2048)).astype(np.float32)
    reps = w.encode(x)
    assert reps.shape == (2, 8, 2048 // 8)
    assert bool((np.abs(np.asarray(reps)) <= 1).all())   # tanh bound
    recon = w.decode(reps)
    assert recon.shape == (2, 2 * 2048)                  # 'b d n -> d (b n)'
    assert np.isfinite(np.asarray(recon)).all()


def test_dvae_wrapper_setup_random_fallback(capsys):
    w = DVAEWrapper(**TINY_DVAE)
    w.setup(gdrive=False)
    out = capsys.readouterr().out
    assert "random weights" in out or "state dict" in out
    assert w.params is not None


@pytest.mark.slow
def test_stacked_diffae_wrapper():
    w = StackedDiffAEWrapper(
        first_stage_config={"capacity": 4, "c_mults": [2, 4], "strides": [2, 2],
                            "latent_dim": 8},
        model_kwargs=dict(second_stage_latent_dim=4, factors=(2, 2),
                          latent_channels=8, latent_multipliers=(1, 2, 2),
                          latent_num_blocks=(1, 1),
                          diffusion_c_mults=(8, 16, 16), diffusion_depth=3))
    x = np.random.default_rng(2).standard_normal((1, 2, 1024)).astype(np.float32)
    small = w.encode(x)
    assert small.shape == (1, 4, 1024 // (4 * 4))
    large = w.decode_stage1to2(small, steps=2)
    assert large.shape == (1, 8, small.shape[2] * 4)
    out = w.decode_stage2(large)
    assert out.shape == (1, 2, 1024)
    full = w.decode(small, steps=2)
    assert full.shape == (1, 2, 1024)


@pytest.mark.slow
def test_stacked_diffae_turbo_aux_decode(monkeypatch):
    """decode_stage1to2 under AA_TURBO_INT8 takes the amax-carry sampler
    (aux threaded across v-DDIM steps) and stays close to the bf16 path
    on a tiny config (whose shapes fall back to non-quantised convs — the
    contract must still roundtrip the aux tree)."""
    w = StackedDiffAEWrapper(
        first_stage_config={"capacity": 4, "c_mults": [2, 4], "strides": [2, 2],
                            "latent_dim": 8},
        model_kwargs=dict(second_stage_latent_dim=4, factors=(2, 2),
                          latent_channels=8, latent_multipliers=(1, 2, 2),
                          latent_num_blocks=(1, 1),
                          diffusion_c_mults=(8, 16, 16), diffusion_depth=3))
    x = np.random.default_rng(2).standard_normal((1, 2, 1024)).astype(np.float32)
    small = w.encode(x)
    import jax as _jax
    w._key = _jax.random.PRNGKey(7)          # same noise draw both calls
    ref = np.asarray(w.decode_stage1to2(small, steps=3))
    monkeypatch.setenv("AA_TURBO_INT8", "1")
    monkeypatch.setenv("AA_TURBO_MIN_B", "1")
    w._key = _jax.random.PRNGKey(7)
    got = np.asarray(w.decode_stage1to2(small, steps=3))
    assert got.shape == ref.shape and np.isfinite(got).all()
    rel = float(np.sqrt(np.mean((got - ref) ** 2)
                        / max(np.mean(ref ** 2), 1e-12)))
    assert rel < 0.1, rel


TINY_DMAE = dict(
    channels=(8, 16), factors=(1, 2), items=(1, 1),
    linear_attentions=(0, 1), attention_features=4, attention_heads=2,
    inject_depth=1, latent_dim=4, resnet_groups=4,
    num_filters=8, window_length=32, lt_stride=16,
    enc_channels=16, enc_multipliers=(1, 1), enc_factors=(2,),
    enc_num_blocks=(1,), n_mels=16, mel_n_fft=64, mel_hop=16)


def test_dmae1d_wrapper():
    w = DMAE1d(model_kwargs=TINY_DMAE)
    w.num_steps = 2
    x = np.random.default_rng(3).standard_normal((1, 2, 4096)).astype(np.float32)
    z = w.encode(x)
    assert z.shape[1] == 4
    assert bool((np.abs(np.asarray(z)) <= 1).all())
    y = w.decode(z)
    assert y.shape[-1] == x.shape[-1]      # match_sizes back to 48k length
    # __call__ dispatches to the DMAE forward OVERRIDE (audio out), not the
    # base (reps, recons) tuple — torch nn.Module semantics
    out = w(x)
    assert not isinstance(out, tuple) and out.shape[-1] == x.shape[-1]


def test_rave_wrapper():
    w = RAVEWrapper(latent_dim=4, n_bands=4)
    x = np.random.default_rng(4).standard_normal((1, 1, 4096)).astype(np.float32)
    z = w.encode(x)
    assert z.shape[1] == 4
    y = w.decode(z)
    assert y.shape[0] == 1 and y.shape[1] == 1
    reps, recon = w.forward(x)
    assert recon.shape[-1] == x.shape[-1]


TINY_CLAPDAE = dict(
    sample_size=4096,
    first_stage_config={"capacity": 4, "c_mults": [2, 4], "strides": [2, 2],
                        "latent_dim": 8},
    model_kwargs=dict(second_stage_latent_dim=4,
                      factors=(2, 2), latent_channels=8,
                      latent_multipliers=(1, 2, 2), latent_num_blocks=(1, 1),
                      diffusion_c_mults=(8, 16), diffusion_depth=2,
                      channels=8, multipliers=(1, 2), factors2=(2,),
                      num_blocks=(1,), attentions=(0, 1)),
    clap_kwargs=dict(audio_cfg=dict(**TINY_AUDIO_CFG),
                     text_cfg=dict(**TINY_TEXT_CFG)))


def test_clapdae_embed_and_generate():
    w = CLAPDAE(**TINY_CLAPDAE)
    w.demo_samples = 4096
    # audio embedding
    x = np.random.default_rng(5).standard_normal((2, 4096)).astype(np.float32)
    emb = w.embed(x)
    assert emb.shape == (1, 1, 512)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb)), 1.0, rtol=1e-3)
    # text embedding
    emb_t = w.embed("a piano melody")
    assert emb_t.shape == (1, 1, 512)
    # generation (tiny steps)
    fakes, latents = w.generate(emb, cfg_scales=2, demo_steps=2, outer_steps=2)
    assert fakes.shape[0] == 2                         # (d, b*n) flattened
    assert np.isfinite(np.asarray(fakes)).all()
    assert bool((np.abs(np.asarray(latents)) <= 1).all())


def test_clapdae_setup_env_fallback(monkeypatch, capsys):
    monkeypatch.delenv("LATENT_DIFFAE_CKPT", raising=False)
    monkeypatch.delenv("CLAP_CKPT", raising=False)
    monkeypatch.delenv("CLAPDAE_CKPT_22s", raising=False)
    w = CLAPDAE(**TINY_CLAPDAE)
    w.setup(model_len='22s')
    out = capsys.readouterr().out
    assert "starting from scratch" in out
    assert w.sample_size == 1048576 or w._explicit_sample_size
