"""Numeric parity of the flax CLAP towers against transformers.ClapModel.

transformers' ClapModel is the HF port of laion_clap (same architecture,
converted weights), so agreeing with it end-to-end — state dict poured
through convert.convert_clap_state_dict, identical inputs, embeddings equal
to float tolerance — certifies that real laion_clap checkpoints load
faithfully (reference given_models.py:682-688). The torch model runs on
CPU; the flax towers run on the test backend.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from audio_algebra_tpu.convert import (  # noqa: E402
    convert_clap_state_dict, infer_clap_cfgs)
from audio_algebra_tpu.models.clap import (  # noqa: E402
    ClapAudioCfg, ClapTextCfg, ClapAudioEmbedder, ClapTextEmbedder)


SPEC_SIZE = 64          # not shape-inferable from a state dict; fixed here
N_MELS = 16             # freq_ratio 4, matching the full model's 256/64


@pytest.fixture(scope="module")
def hf_clap():
    from transformers import ClapConfig, ClapModel

    cfg = ClapConfig(
        projection_dim=24,
        audio_config=dict(
            spec_size=SPEC_SIZE, patch_size=4, patch_stride=4,
            num_mel_bins=N_MELS, patch_embeds_hidden_size=16,
            depths=[1, 2], num_attention_heads=[2, 2], window_size=4,
            mlp_ratio=4, hidden_size=32, enable_fusion=False,
            drop_path_rate=0.0, attention_probs_dropout_prob=0.0,
            hidden_dropout_prob=0.0, projection_dim=24),
        text_config=dict(
            vocab_size=120, hidden_size=128, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=96,
            max_position_embeddings=80, attention_probs_dropout_prob=0.0,
            hidden_dropout_prob=0.0, projection_dim=24))
    torch.manual_seed(7)
    model = ClapModel(cfg).eval()
    # give the mel BatchNorm non-trivial running stats so the bn pour is
    # actually exercised (fresh init is mean 0 / var 1 = identity)
    bn = model.audio_model.audio_encoder.batch_norm
    bn.running_mean.data.normal_(0.0, 0.5)
    bn.running_var.data.uniform_(0.5, 2.0)
    # the relative position bias initialises to zero; randomise so window
    # attention parity actually checks the bias indexing
    for name, p in model.named_parameters():
        if "relative_position_bias_table" in name:
            p.data.normal_(0.0, 0.2)
    return model


@pytest.fixture(scope="module")
def flax_clap(hf_clap):
    sd = {k: v.detach().cpu().numpy() for k, v in hf_clap.state_dict().items()}
    a_cfg, t_cfg = infer_clap_cfgs(
        sd, ClapAudioCfg(spec_size=SPEC_SIZE), ClapTextCfg())
    assert a_cfg.patch_embed_hidden == 16 and a_cfg.depths == (1, 2)
    assert a_cfg.heads == (2, 2) and a_cfg.window == 4
    assert a_cfg.num_mel_bins == N_MELS and a_cfg.projection_dim == 24
    assert t_cfg.vocab == 120 and t_cfg.hidden == 128 and t_cfg.layers == 2
    assert t_cfg.heads == 2 and t_cfg.intermediate == 96

    audio = ClapAudioEmbedder(a_cfg)
    text = ClapTextEmbedder(t_cfg)
    import jax
    a0 = audio.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 1, 256, N_MELS), jnp.float32))
    t0 = text.init(jax.random.PRNGKey(1), jnp.zeros((1, 6), jnp.int32))
    a_params, t_params, hits, misses = convert_clap_state_dict(sd, a0, t0)
    assert not misses, misses
    n_slots = len(jax.tree_util.tree_leaves(a0)) + \
        len(jax.tree_util.tree_leaves(t0))
    assert hits == n_slots, (hits, n_slots)   # every flax param poured
    return audio, a_params, text, t_params


def test_audio_tower_parity_full_width(hf_clap, flax_clap):
    """T == spec_width: the pure Swin path (no interpolation)."""
    audio, a_params, _, _ = flax_clap
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 1, 256, N_MELS)).astype(np.float32)
    with torch.no_grad():
        want = hf_clap.get_audio_features(
            input_features=torch.from_numpy(feats)).numpy()
    got = np.asarray(audio.apply(a_params, jnp.asarray(feats)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_audio_tower_parity_interpolated(hf_clap, flax_clap):
    """T < spec_width: exercises the torch-compatible bicubic time
    interpolation (align_corners=True, a=-0.75)."""
    audio, a_params, _, _ = flax_clap
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((2, 1, 201, N_MELS)).astype(np.float32)
    with torch.no_grad():
        want = hf_clap.get_audio_features(
            input_features=torch.from_numpy(feats)).numpy()
    got = np.asarray(audio.apply(a_params, jnp.asarray(feats)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_text_tower_parity(hf_clap, flax_clap):
    """RoBERTa encoder + pooler + projection, with padding."""
    _, _, text, t_params = flax_clap
    ids = np.array([[0, 17, 42, 99, 2, 1, 1, 1],
                    [0, 5, 2, 1, 1, 1, 1, 1],
                    [0, 88, 77, 66, 55, 44, 33, 2]], np.int64)
    mask = (ids != 1).astype(np.int64)
    with torch.no_grad():
        want = hf_clap.get_text_features(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask)).numpy()
    got = np.asarray(text.apply(t_params, jnp.asarray(ids.astype(np.int32))))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_laion_dialect_equals_hf_dialect(hf_clap, flax_clap):
    """Renaming the HF state dict into the laion_clap/timm dialect (fused
    qkv, norm1/2, mlp.fc1/2, Sequential projections) pours identically —
    so real CLAP_CKPT files take the same path the oracle certifies."""
    import jax

    audio, a_params, text, t_params = flax_clap
    sd = {k: v.detach().cpu().numpy() for k, v in hf_clap.state_dict().items()}
    renamed = {}
    fused = {}
    for k, v in sd.items():
        k2 = k.replace("audio_model.audio_encoder.", "audio_branch.")
        k2 = k2.replace("text_model.", "text_branch.")
        k2 = k2.replace("audio_branch.batch_norm.", "audio_branch.bn0.")
        if "audio_branch" in k2:
            k2 = k2.replace(".layernorm_before.", ".norm1.")
            k2 = k2.replace(".layernorm_after.", ".norm2.")
            k2 = k2.replace(".attention.output.dense.", ".attn.proj.")
            k2 = k2.replace(".intermediate.dense.", ".mlp.fc1.")
            k2 = k2.replace(".output.dense.", ".mlp.fc2.")
            k2 = k2.replace(".attention.self.relative_position_bias_table",
                            ".attn.relative_position_bias_table")
            m = None
            for part in ("query", "key", "value"):
                tag = f".attention.self.{part}."
                if tag in k2:
                    m = (k2.split(tag)[0], part, k2.split(tag)[1])
            if m:
                fused.setdefault((m[0], m[2]), {})[m[1]] = v
                continue
        k2 = k2.replace("audio_projection.linear1.", "audio_projection.0.")
        k2 = k2.replace("audio_projection.linear2.", "audio_projection.2.")
        k2 = k2.replace("text_projection.linear1.", "text_projection.0.")
        k2 = k2.replace("text_projection.linear2.", "text_projection.2.")
        renamed[k2] = v
    for (prefix, leaf), parts in fused.items():
        renamed[f"{prefix}.attn.qkv.{leaf}"] = np.concatenate(
            [parts["query"], parts["key"], parts["value"]], axis=0)

    import jax.numpy as jnp
    a0 = jax.tree_util.tree_map(np.zeros_like, a_params)
    t0 = jax.tree_util.tree_map(np.zeros_like, t_params)
    a2, t2, hits, misses = convert_clap_state_dict(renamed, a0, t0)
    assert not misses, misses
    for got, want in zip(jax.tree_util.tree_leaves(a2),
                         jax.tree_util.tree_leaves(a_params)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    for got, want in zip(jax.tree_util.tree_leaves(t2),
                         jax.tree_util.tree_leaves(t_params)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


# ---------------------------------------------------------------------------
# fusion branch (enable_fusion=True — the reference's construction,
# given_models.py:573): mel_conv2d local crops + AFF merge
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def hf_clap_fusion():
    from transformers import ClapConfig, ClapModel

    cfg = ClapConfig(
        projection_dim=24,
        audio_config=dict(
            spec_size=SPEC_SIZE, patch_size=4, patch_stride=4,
            num_mel_bins=N_MELS, patch_embeds_hidden_size=16,
            depths=[1, 2], num_attention_heads=[2, 2], window_size=4,
            mlp_ratio=4, hidden_size=32, enable_fusion=True,
            fusion_type="aff_2d", aff_block_r=4,
            drop_path_rate=0.0, attention_probs_dropout_prob=0.0,
            hidden_dropout_prob=0.0, projection_dim=24),
        text_config=dict(
            vocab_size=120, hidden_size=128, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=96,
            max_position_embeddings=80, attention_probs_dropout_prob=0.0,
            hidden_dropout_prob=0.0, projection_dim=24))
    torch.manual_seed(11)
    model = ClapModel(cfg).eval()
    # non-trivial BatchNorm running stats in BOTH the mel bn and the AFF
    # blocks so the fusion bn pours are actually exercised
    for mod in model.modules():
        if isinstance(mod, torch.nn.modules.batchnorm._BatchNorm):
            mod.running_mean.data.normal_(0.0, 0.5)
            mod.running_var.data.uniform_(0.5, 2.0)
    for name, p in model.named_parameters():
        if "relative_position_bias_table" in name:
            p.data.normal_(0.0, 0.2)
    return model


@pytest.fixture(scope="module")
def flax_clap_fusion(hf_clap_fusion):
    import jax

    sd = {k: v.detach().cpu().numpy()
          for k, v in hf_clap_fusion.state_dict().items()}
    a_cfg, t_cfg = infer_clap_cfgs(
        sd, ClapAudioCfg(spec_size=SPEC_SIZE), ClapTextCfg())
    assert a_cfg.enable_fusion and a_cfg.aff_r == 4   # inferred from the sd
    audio = ClapAudioEmbedder(a_cfg)
    a0 = audio.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 1, 256, N_MELS), jnp.float32))
    text = ClapTextEmbedder(t_cfg)
    t0 = text.init(jax.random.PRNGKey(1), jnp.zeros((1, 6), jnp.int32))
    a_params, t_params, hits, misses = convert_clap_state_dict(sd, a0, t0)
    assert not misses, misses
    import jax.tree_util as jtu
    n_slots = len(jtu.tree_leaves(a0)) + len(jtu.tree_leaves(t0))
    assert hits == n_slots, (hits, n_slots)   # incl. every fusion tensor
    return audio, a_params


def test_clap_fusion_long_parity(hf_clap_fusion, flax_clap_fusion):
    """is_longer: the mel_conv2d local-crop path + AFF merge, vs HF."""
    audio, a_params = flax_clap_fusion
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((2, 4, 256, N_MELS)).astype(np.float32)
    with torch.no_grad():
        want = hf_clap_fusion.get_audio_features(
            input_features=torch.from_numpy(feats),
            is_longer=torch.tensor([[True], [True]])).numpy()
    got = np.asarray(audio.apply(a_params, jnp.asarray(feats),
                                 is_longer=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_clap_fusion_short_parity(hf_clap_fusion, flax_clap_fusion):
    """not is_longer: only the global channel is read (HF semantics for
    short clips, where all 4 channels are copies)."""
    audio, a_params = flax_clap_fusion
    rng = np.random.default_rng(4)
    feats = rng.standard_normal((2, 4, 256, N_MELS)).astype(np.float32)
    with torch.no_grad():
        want = hf_clap_fusion.get_audio_features(
            input_features=torch.from_numpy(feats),
            is_longer=torch.tensor([[False], [False]])).numpy()
    got = np.asarray(audio.apply(a_params, jnp.asarray(feats),
                                 is_longer=False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fusion_features_front_end():
    """audio_to_fusion_features layout: channel 0 is the bilinear shrink of
    the full log-mel, channels 1-3 are crops at the deterministic
    thirds-centre starts."""
    from audio_algebra_tpu.models.clap import (
        audio_to_fusion_features, audio_to_input_features,
        fusion_crop_starts)

    from audio_algebra_tpu.ops.mel import melspectrogram

    cfg = ClapAudioCfg(spec_size=SPEC_SIZE, num_mel_bins=N_MELS,
                       enable_fusion=True, clip_samples=48000)
    rng = np.random.default_rng(5)
    wav = jnp.asarray(rng.standard_normal((1, 3 * 48000)).astype(np.float32))
    feats = np.asarray(audio_to_fusion_features(wav, cfg))
    chunk = cfg.clip_samples // cfg.hop + 1
    assert feats.shape == (1, 4, chunk, N_MELS)
    # the FULL-length log-mel (audio_to_input_features truncates to
    # clip_samples — the short-clip path — so build it directly)
    mel = melspectrogram(wav, cfg.sample_rate, cfg.n_fft, cfg.hop,
                         n_mels=cfg.num_mel_bins, power=2.0,
                         f_min=cfg.f_min, f_max=cfg.f_max)
    full = np.asarray(10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
                      ).transpose(0, 2, 1)                       # (1, T, F)
    assert full.shape[1] > chunk
    starts = fusion_crop_starts(full.shape[1], chunk)
    assert starts[0] < starts[1] < starts[2]
    for ch, s in zip((1, 2, 3), starts):
        np.testing.assert_allclose(feats[:, ch], full[:, s:s + chunk],
                                   rtol=1e-5, atol=1e-5)
    # bilinear shrink equals torch's interpolate(align_corners=False)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(full).unsqueeze(1),
        size=(chunk, N_MELS), mode="bilinear",
        align_corners=False).squeeze(1).numpy()
    np.testing.assert_allclose(feats[:, 0], want, rtol=1e-4, atol=1e-4)
