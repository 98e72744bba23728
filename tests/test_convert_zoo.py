"""Checkpoint conversion tests for the rest of the pretrained zoo
(stacked diffae, LDM generator, DMAE, RAVE torchscript, CLAP towers),
mirroring tests/test_convert_dvae.py's synthetic-state-dict approach:
build a torch-layout state dict from known values, convert, and assert the
values landed in the flax tree."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_algebra_tpu.convert import (
    _flat_params, convert_stacked_state_dict, convert_ldm_state_dict,
    convert_dmae_state_dict, convert_rave_state_dict,
    load_torchscript_state_dict, convert_clap_state_dict)
from audio_algebra_tpu.utils.params import fast_random_params


def _torch_layout(arr: np.ndarray) -> np.ndarray:
    """Inverse of checkpoint.torch_to_flax_array."""
    if arr.ndim == 3:
        return np.transpose(arr, (2, 1, 0))
    if arr.ndim == 2:
        return np.transpose(arr, (1, 0))
    return arr


def _flat_dict(tree):
    return {"/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                     for p in path): np.asarray(leaf)
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]}


def _synthetic_sd(params, top_map, rng, ema_prefix=None):
    """Build {torch_name: torch-layout array} + {flax_path: target} from a
    flax template. top_map: flax_top_module -> torch prefix. Names are
    grouped per module (a conv's weight/bias share a stem; a norm's scale
    becomes a 1-D .weight with its bias as sibling) so the kind-aware pour
    reads them like a real torch state dict."""
    sd, target, modules = {}, {}, {}
    for path, shape in _flat_params(params):
        parts = path.split("/")
        top = parts[1] if parts[0] == "params" else parts[0]
        if top not in top_map:
            continue
        val = rng.standard_normal(shape).astype(np.float32)
        target[path] = val
        modules.setdefault("/".join(parts[:-1]), {})[parts[-1]] = val
    for parent, leaves in modules.items():
        parts = parent.split("/")
        mods = parts[1:] if parts[0] == "params" else parts
        top, rest = mods[0], mods[1:]
        prefix = top_map[top]
        if ema_prefix and top in ema_prefix:
            prefix = ema_prefix[top]
        stem = ".".join([prefix] + rest)
        for leafname, val in leaves.items():
            suffix = "bias" if leafname == "bias" else "weight"
            sd[f"{stem}.{suffix}"] = _torch_layout(val)
    return sd, target


def _assert_mostly_landed(converted, target, frac=0.7):
    flat = _flat_dict(converted)
    matched = sum(np.allclose(flat[p], v, atol=1e-6)
                  for p, v in target.items())
    assert matched / max(len(target), 1) > frac, (matched, len(target))


def _tiny_stacked():
    from audio_algebra_tpu.models.stacked import LatentAudioDiffusionAutoencoder
    m = LatentAudioDiffusionAutoencoder(
        ae_capacity=4, ae_c_mults=(2, 4), ae_strides=(4, 4),
        latent_channels=8, latent_multipliers=(1, 2, 4),
        latent_num_blocks=(1, 1), factors=(2, 2),
        diffusion_c_mults=(8, 8), diffusion_depth=2)
    p = fast_random_params(m, 0, jnp.zeros((1, 2, 2048)), jnp.zeros((1,)))
    return m, p


def test_convert_stacked_roundtrip_with_ema_swap():
    _, params = _tiny_stacked()
    rng = np.random.default_rng(3)
    # diffusion + latent_encoder arrive under *_ema prefixes (the reference
    # swaps EMA copies in at setup, given_models.py:414-416); the
    # autoencoder has no EMA twin
    sd, target = _synthetic_sd(
        params,
        {"autoencoder": "autoencoder", "latent_encoder": "latent_encoder",
         "diffusion": "diffusion"},
        rng,
        ema_prefix={"latent_encoder": "latent_encoder_ema",
                    "diffusion": "diffusion_ema"})
    converted, hits, misses = convert_stacked_state_dict(sd, params)
    assert hits == len(target), (hits, len(target), misses[:5])
    assert not misses
    _assert_mostly_landed(converted, target)


def test_convert_stacked_warns_on_zero_hits(capsys):
    _, params = _tiny_stacked()
    sd = {"diffusion.bogus.weight": np.zeros((7, 7, 7), np.float32)}
    _, hits, misses = convert_stacked_state_dict(sd, params)
    assert hits == 0 and misses
    assert "NOT applied" in capsys.readouterr().out


def test_convert_ldm_prefers_ema_model():
    from audio_algebra_tpu.models.stacked import StackedAELatentDiffusionCond
    m = StackedAELatentDiffusionCond(
        latent_dim=4, channels=8, multipliers=(1, 2, 2), factors=(1, 2),
        num_blocks=(1, 1), attentions=(0, 0, 1))
    params = fast_random_params(
        m, {"params": jax.random.PRNGKey(0), "cfg": jax.random.PRNGKey(1)},
        jnp.zeros((1, 4, 64)), jnp.zeros((1,)),
        embedding=jnp.zeros((1, 1, 512)))
    rng = np.random.default_rng(5)
    sd_online, _ = _synthetic_sd(params, {"diffusion": "diffusion"}, rng)
    # ema_pytorch layout: diffusion_ema.ema_model.* should WIN over the
    # online diffusion.* copy (reference inference uses the EMA copy)
    rng2 = np.random.default_rng(6)
    sd_ema, target_ema = _synthetic_sd(
        params, {"diffusion": "diffusion_ema.ema_model"}, rng2)
    sd = {**sd_online, **sd_ema,
          "diffusion_ema.initted": np.array(True),
          "diffusion_ema.step": np.array(100)}
    converted, hits, misses = convert_ldm_state_dict(sd, params)
    assert hits == len(target_ema), (hits, len(target_ema), misses[:5])
    _assert_mostly_landed(converted, target_ema)


def test_convert_dmae_full_pour():
    """Synthetic round-trip through the {encoder, rest} bucket split (the
    forward-parity certification lives in test_convert_parity.py)."""
    from audio_algebra_tpu.models.dmae import DiffusionAE1d
    m = DiffusionAE1d(
        channels=(8, 16), factors=(1, 2), items=(1, 1),
        linear_attentions=(0, 1), attention_features=4, attention_heads=2,
        inject_depth=1, latent_dim=4, resnet_groups=4,
        num_filters=8, window_length=32, lt_stride=16,
        enc_channels=16, enc_multipliers=(1, 1), enc_factors=(2,),
        enc_num_blocks=(1,), n_mels=16, mel_n_fft=64, mel_hop=16)
    params = fast_random_params(m, 0, jnp.zeros((1, 2, 1024)),
                                jnp.zeros((1,)))
    rng = np.random.default_rng(9)
    sd, target = _synthetic_sd(
        params, {"encoder": "encoder", "unet": "unet", "lt": "lt"}, rng)
    converted, hits, misses = convert_dmae_state_dict(sd, params)
    assert hits == len(target), (hits, len(target), misses[:5])
    _assert_mostly_landed(converted, target)


def test_rave_torchscript_load_and_pour(tmp_path):
    """VERDICT item 3: script a tiny torch module whose encoder/decoder
    tensors shape-match the JAX RAVE, save .ts, prove setup pours it."""
    torch = pytest.importorskip("torch")
    from audio_algebra_tpu.models.rave import RAVE
    from audio_algebra_tpu.given_models import RAVEWrapper

    model = RAVE(latent_dim=4, n_bands=4, capacity=4, strides=(2, 2))
    params = fast_random_params(model, 0, jnp.zeros((1, 1, 1024)))

    # build a scripted torch module carrying encoder./decoder. parameters
    # in torch layout, with values we can recognise after the pour
    rng = np.random.default_rng(11)
    tensors, target, modules = {}, {}, {}
    for path, shape in _flat_params(params):
        parts = path.split("/")
        side = "encoder" if parts[1].startswith("enc") else \
               "decoder" if parts[1].startswith("dec") else None
        if side is None:
            continue
        val = rng.standard_normal(shape).astype(np.float32)
        target[path] = val
        modules.setdefault((side, "/".join(parts[1:-1])), {})[parts[-1]] = val
    for (side, stem), leaves in modules.items():
        for leafname, val in leaves.items():
            suffix = "bias" if leafname == "bias" else "weight"
            tensors[f"{side}.{stem.replace('/', '_')}.{suffix}"] = \
                _torch_layout(val)

    class Leaf(torch.nn.Module):
        def forward(self, x):
            return x

    class Half(torch.nn.Module):
        """One submodule per weight/bias stem, so the exported state dict
        carries real `<module>.weight` / `<module>.bias` names."""
        def __init__(self, prefix):
            super().__init__()
            for name, arr in tensors.items():
                if name.startswith(prefix + "."):
                    stem, suffix = name[len(prefix) + 1:].rsplit(".", 1)
                    sub = getattr(self, stem, None)
                    if sub is None:
                        sub = Leaf()
                        setattr(self, stem, sub)
                    sub.register_parameter(
                        suffix, torch.nn.Parameter(torch.from_numpy(arr)))

        def forward(self, x):
            return x

    class TinyRave(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = Half("encoder")
            self.decoder = Half("decoder")

        def forward(self, x):
            return self.decoder(self.encoder(x))

    ts_path = tmp_path / "tiny_rave.ts"
    torch.jit.save(torch.jit.script(TinyRave()), str(ts_path))

    sd = load_torchscript_state_dict(str(ts_path))
    assert len(sd) == len(tensors)
    converted, hits, misses = convert_rave_state_dict(sd, params)
    assert hits == len(target), (hits, len(target), misses[:5])
    _assert_mostly_landed(converted, target)

    # end-to-end through the wrapper: setup() must pour the weights
    w = RAVEWrapper(checkpoint_file=str(ts_path), latent_dim=4, n_bands=4)
    w.model = model
    w.params = params
    w.ckpt_info["ckpt_path"] = str(ts_path)
    w.ckpt_info["ckpt_url"] = ""
    w.setup()
    _assert_mostly_landed(w.params, target)


def _tiny_clap():
    from audio_algebra_tpu.models.clap import (
        CLAPModule, TINY_AUDIO_CFG, TINY_TEXT_CFG)

    clap = CLAPModule(audio_cfg=dict(**TINY_AUDIO_CFG),
                      text_cfg=dict(**TINY_TEXT_CFG))
    clap._ensure_init(4096)
    return clap


def test_convert_clap_laion_dialect():
    """laion_clap/timm naming pours: Sequential projections (indices 0/2),
    fused qkv split into thirds, norm1/norm2 -> layernorm before/after,
    bn0 running stats, patch-embed conv layout."""
    clap = _tiny_clap()
    rng = np.random.default_rng(13)
    hid = clap.audio_cfg.patch_embed_hidden

    qkv_w = rng.standard_normal((3 * hid, hid)).astype(np.float32)
    qkv_b = rng.standard_normal(3 * hid).astype(np.float32)
    pe_w = rng.standard_normal((hid, 1, 4, 4)).astype(np.float32)
    p1 = rng.standard_normal((512, clap.audio_cfg.num_features)).astype(np.float32)
    p2 = rng.standard_normal((512, 512)).astype(np.float32)
    tp2 = rng.standard_normal((512, 512)).astype(np.float32)
    bn_mean = rng.standard_normal(8).astype(np.float32)
    fc1 = rng.standard_normal((4 * hid, hid)).astype(np.float32)
    sd = {
        "audio_projection.0.weight": p1,
        "audio_projection.0.bias": rng.standard_normal(512).astype(np.float32),
        "audio_projection.2.weight": p2,
        "text_projection.2.weight": tp2,
        "audio_branch.bn0.running_mean": bn_mean,
        "audio_branch.patch_embed.proj.weight": pe_w,
        "audio_branch.layers.0.blocks.0.attn.qkv.weight": qkv_w,
        "audio_branch.layers.0.blocks.0.attn.qkv.bias": qkv_b,
        "audio_branch.layers.0.blocks.0.norm1.weight":
            rng.standard_normal(hid).astype(np.float32),
        "audio_branch.layers.0.blocks.0.mlp.fc1.weight": fc1,
        # non-embedding tensors: skipped with a report, never poured
        "audio_branch.tscam_conv.weight":
            rng.standard_normal((4, 4, 3, 3)).astype(np.float32),
        "audio_branch.attn.relative_position_index":
            np.zeros((16, 16), np.int64),
    }
    new_audio, new_text, hits, misses = convert_clap_state_dict(
        sd, clap.audio_params, clap.text_params)
    assert hits >= 9, (hits, misses)
    assert not misses, misses
    na = _flat_dict(new_audio)
    nt = _flat_dict(new_text)
    np.testing.assert_allclose(
        na["params/audio_projection/linear1/kernel"], p1.T, atol=1e-6)
    np.testing.assert_allclose(
        na["params/audio_projection/linear2/kernel"], p2.T, atol=1e-6)
    np.testing.assert_allclose(
        nt["params/text_projection/linear2/kernel"], tp2.T, atol=1e-6)
    np.testing.assert_allclose(na["params/audio_branch/bn_mean"], bn_mean)
    np.testing.assert_allclose(
        na["params/audio_branch/patch_proj/kernel"],
        pe_w.transpose(2, 3, 1, 0), atol=1e-6)
    blk = "params/audio_branch/layers_0_blocks_0"
    np.testing.assert_allclose(na[f"{blk}/attn/query/kernel"],
                               qkv_w[:hid].T, atol=1e-6)
    np.testing.assert_allclose(na[f"{blk}/attn/value/bias"],
                               qkv_b[2 * hid:], atol=1e-6)
    np.testing.assert_allclose(na[f"{blk}/intermediate/kernel"],
                               fc1.T, atol=1e-6)


def test_infer_clap_cfgs_from_sd():
    """Tower hyperparameters reconstruct from checkpoint shapes alone."""
    from audio_algebra_tpu.convert import infer_clap_cfgs
    from audio_algebra_tpu.models.clap import ClapAudioCfg, ClapTextCfg

    rng = np.random.default_rng(3)
    hid, window, heads = 24, 4, (3, 6)
    sd = {
        "audio_branch.patch_embed.proj.weight":
            rng.standard_normal((hid, 1, 4, 4)).astype(np.float32),
        "audio_branch.bn0.weight": np.ones(16, np.float32),
        "audio_branch.layers.0.blocks.0.attn.relative_position_bias_table":
            np.zeros(((2 * window - 1) ** 2, heads[0]), np.float32),
        "audio_branch.layers.0.blocks.1.norm1.weight": np.ones(hid, np.float32),
        "audio_branch.layers.1.blocks.0.attn.relative_position_bias_table":
            np.zeros(((2 * window - 1) ** 2, heads[1]), np.float32),
        "audio_branch.layers.0.blocks.0.mlp.fc1.weight":
            rng.standard_normal((4 * hid, hid)).astype(np.float32),
        "text_branch.embeddings.word_embeddings.weight":
            rng.standard_normal((512, 128)).astype(np.float32),
        "text_branch.embeddings.position_embeddings.weight":
            rng.standard_normal((80, 128)).astype(np.float32),
        "text_branch.encoder.layer.0.intermediate.dense.weight":
            rng.standard_normal((256, 128)).astype(np.float32),
        "text_branch.encoder.layer.1.intermediate.dense.weight":
            rng.standard_normal((256, 128)).astype(np.float32),
        "audio_projection.2.weight": rng.standard_normal((320, 320)).astype(np.float32),
    }
    a, t = infer_clap_cfgs(sd, ClapAudioCfg(), ClapTextCfg())
    assert a.patch_embed_hidden == hid and a.window == window
    assert a.depths == (2, 1) and a.heads == heads
    assert a.num_mel_bins == 16 and a.mlp_ratio == 4
    assert a.projection_dim == 320 and t.projection_dim == 320
    assert t.vocab == 512 and t.hidden == 128 and t.heads == 2
    assert t.layers == 2 and t.max_pos == 80 and t.intermediate == 256


def test_convert_report_flags_permuted_same_shape_pairs(capsys):
    """VERDICT r4 item 7: the ambiguity audit. Two same-shape conv weights
    whose torch natural-sort order crosses the flax slot order pair purely
    by ordering — convert_report() must record the ambiguous group and
    flag both pairings as suspicious (attn tensor in an updown slot and
    vice versa). With name-aligned slots the same shapes pour cleanly."""
    from audio_algebra_tpu.convert import convert_by_shape, convert_report

    rng = np.random.default_rng(0)
    w_attn = rng.standard_normal((8, 8, 3)).astype(np.float32)
    w_down = rng.standard_normal((8, 8, 3)).astype(np.float32)
    sd = {"net.attn.weight": w_attn.copy(),
          "net.downsample.weight": w_down.copy()}

    # crossed: flax 'down_conv' sorts before 'x_attn', torch 'attn' before
    # 'downsample' -> attn lands in down_conv, downsample in x_attn
    crossed = {"params": {
        "down_conv": {"kernel": jnp.zeros((3, 8, 8))},
        "x_attn": {"kernel": jnp.zeros((3, 8, 8))},
    }}
    new, hits, misses = convert_by_shape(sd, crossed,
                                         buckets={"params": ("net.",)})
    assert hits == 2 and not misses
    rep = convert_report()
    assert rep["n_placed"] == 2
    assert len(rep["ambiguous_groups"]) == 1
    assert len(rep["ambiguous_groups"][0]["members"]) == 2
    classes = {(s["torch_class"], s["flax_class"]) for s in rep["suspicious"]}
    assert ("attn", "updown") in classes and ("updown", "attn") in classes
    out = capsys.readouterr().out
    assert "SUSPICIOUS" in out and "paired by order alone" in out
    # the mis-pour the audit is flagging actually happened:
    np.testing.assert_allclose(
        np.asarray(new["params"]["down_conv"]["kernel"]),
        np.transpose(w_attn, (2, 1, 0)))

    # aligned: same shapes, slot names in matching classes and order ->
    # still an ambiguous group (ordering decided), but nothing suspicious
    aligned = {"params": {
        "attn_proj": {"kernel": jnp.zeros((3, 8, 8))},
        "downsample": {"kernel": jnp.zeros((3, 8, 8))},
    }}
    new2, hits2, _ = convert_by_shape(sd, aligned,
                                      buckets={"params": ("net.",)})
    assert hits2 == 2
    rep2 = convert_report()
    assert len(rep2["ambiguous_groups"]) == 1
    assert rep2["suspicious"] == []
    np.testing.assert_allclose(
        np.asarray(new2["params"]["attn_proj"]["kernel"]),
        np.transpose(w_attn, (2, 1, 0)))
