"""Shape/dtype/grad smoke tests for the model zoo (tiny configs, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_algebra_tpu.models import (
    SoundStreamXLEncoder, SoundStreamXLDecoder, DiffusionAttnUnet1D,
    AudioAutoencoder, Encoder1d, Memcodes, ResidualMemcodes,
    EmbedBlock, AudioAlgebra, ema_update, EMASchedule, UNetCFG1d,
    DiffusionDVAE, LatentAudioDiffusionAutoencoder, StackedAELatentDiffusionCond,
)

KEY = jax.random.PRNGKey(0)


@pytest.mark.slow
def test_soundstream_encoder_ratio():
    enc = SoundStreamXLEncoder(in_channels=2, capacity=4, latent_dim=8,
                               c_mults=(2, 4), strides=(4, 2))
    x = jnp.ones((2, 2, 1024))
    params = enc.init(KEY, x)
    y = enc.apply(params, x)
    assert y.shape == (2, 8, 1024 // 8)


@pytest.mark.slow
def test_soundstream_roundtrip_shapes():
    enc = SoundStreamXLEncoder(in_channels=2, capacity=4, latent_dim=8,
                               c_mults=(2, 4), strides=(2, 2))
    dec = SoundStreamXLDecoder(out_channels=2, capacity=4, latent_dim=8,
                               c_mults=(2, 4), strides=(2, 2))
    x = jnp.ones((1, 2, 512))
    z = enc.apply(enc.init(KEY, x), x)
    y = dec.apply(dec.init(KEY, z), z)
    assert z.shape == (1, 8, 128)
    assert y.shape == (1, 2, 512)


@pytest.mark.slow
def test_audio_autoencoder():
    ae = AudioAutoencoder(capacity=4, c_mults=(2, 4), strides=(2, 2), latent_dim=8)
    x = jnp.ones((1, 2, 256))
    params = ae.init(KEY, x)
    z, recon = ae.apply(params, x)
    assert z.shape == (1, 8, 64) and recon.shape == x.shape
    assert bool((jnp.abs(z) <= 1.0).all())  # tanh bound
    assert ae.downsampling_ratio == 4


@pytest.mark.slow
def test_diffusion_attn_unet1d():
    net = DiffusionAttnUnet1D(io_channels=2, cond_dim=8, n_attn_layers=1,
                              c_mults=(16, 16, 32))
    x = jnp.ones((2, 2, 256))
    t = jnp.ones((2,))
    cond = jnp.ones((2, 8, 32))
    params = net.init(KEY, x, t, cond)
    v = net.apply(params, x, t, cond)
    assert v.shape == x.shape
    assert np.isfinite(np.asarray(v)).all()


def test_split_skip_join_matches_concat():
    """The up-path split skip-join (Conv1d/SplitLinear over channel-parts,
    blocks.py) must be numerically identical to materialising the concat:
    conv(cat(a,b), W) == conv(a, W[:, :Ca]) + conv(b, W[:, Ca:])."""
    from audio_algebra_tpu.models.blocks import Conv1d, SplitLinear, ResConvBlock

    rng = jax.random.PRNGKey(3)
    a = jax.random.normal(rng, (2, 64, 16))
    b = jax.random.normal(jax.random.PRNGKey(4), (2, 64, 24))
    cat = jnp.concatenate([a, b], axis=-1)

    conv = Conv1d(8, 5)
    p = conv.init(KEY, cat)
    np.testing.assert_allclose(np.asarray(conv.apply(p, (a, b))),
                               np.asarray(conv.apply(p, cat)),
                               rtol=1e-5, atol=1e-5)

    lin = SplitLinear(8)
    pl_ = lin.init(KEY, (a, b))
    dense = cat @ pl_["params"]["kernel"]
    np.testing.assert_allclose(np.asarray(lin.apply(pl_, (a, b))),
                               np.asarray(dense), rtol=1e-5, atol=1e-5)

    # whole block: pair input == concat input (params shared by shape)
    blk = ResConvBlock(16, 16)
    pb = blk.init(KEY, cat)
    np.testing.assert_allclose(np.asarray(blk.apply(pb, (a, b))),
                               np.asarray(blk.apply(pb, cat)),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("padding,stride,dilation",
                         [("VALID", 1, 1), ("VALID", 2, 1), (0, 1, 2),
                          (4, 1, 1), ("SAME", 2, 2)])
def test_conv1d_module_honors_padding(padding, stride, dilation):
    """Conv1d's `padding` field must drive the computation (it was once a
    dead field that silently computed SAME for every request) — parity vs
    the plain lax helper for VALID / int / strided / dilated combos."""
    from audio_algebra_tpu.models.blocks import Conv1d, conv1d

    x = jax.random.normal(KEY, (2, 64, 16))
    conv = Conv1d(8, kernel_size=5, stride=stride, dilation=dilation,
                  padding=padding, use_bias=False)
    p = conv.init(KEY, x)
    want = conv1d(x, p["params"]["kernel"], stride=stride,
                  dilation=dilation, padding=padding)
    got = conv.apply(p, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_diffusion_unet_uncond():
    net = DiffusionAttnUnet1D(io_channels=4, cond_dim=0, n_attn_layers=0,
                              c_mults=(8, 16), depth=2)
    x = jnp.ones((1, 4, 64))
    params = net.init(KEY, x, jnp.ones((1,)))
    v = net.apply(params, x, jnp.ones((1,)))
    assert v.shape == x.shape


@pytest.mark.slow
def test_encoder1d_ratio():
    enc = Encoder1d(in_channels=8, out_channels=4, channels=8,
                    multipliers=(1, 2, 2), factors=(2, 2), num_blocks=(1, 1))
    x = jnp.ones((2, 8, 64))
    y = enc.apply(enc.init(KEY, x), x)
    assert y.shape == (2, 4, 16)


def test_memcodes_straight_through():
    q = Memcodes(dim=16, heads=4, num_codes=32)
    x = jax.random.normal(KEY, (2, 10, 16))
    params = q.init(KEY, x)
    out, idx = q.apply(params, x)
    assert out.shape == x.shape and idx.shape == (2, 10, 4)
    assert idx.dtype in (jnp.int32, jnp.int64)
    # quantized output must be exactly the selected codebook entries
    codes = np.asarray(params["params"]["codes"])       # (heads, num_codes, dh)
    out_h = np.asarray(out).reshape(2, 10, 4, 4)
    idx_np = np.asarray(idx)
    for h in range(4):
        np.testing.assert_allclose(out_h[..., h, :], codes[h][idx_np[..., h]],
                                   rtol=1e-5, atol=1e-6)
    # gradient flows through (straight-through)
    g = jax.grad(lambda p, x: q.apply(p, x)[0].sum(), argnums=1)(params, x)
    assert np.abs(np.asarray(g)).sum() > 0


def test_residual_memcodes():
    q = ResidualMemcodes(dim=16, heads=4, num_codes=32, num_quantizers=2)
    x = jax.random.normal(KEY, (1, 6, 16))
    params = q.init(KEY, x)
    out, idx = q.apply(params, x)
    assert out.shape == x.shape and idx.shape == (1, 6, 4, 2)


def test_audio_algebra_shapes_and_residual():
    aa = AudioAlgebra(dims=16, hidden_dims=32)
    y = jax.random.normal(KEY, (3, 16, 20))   # (b, d, n)
    params = aa.init(KEY, y)
    z, yrecon = aa.apply(params, y)
    assert z.shape == y.shape and yrecon.shape == y.shape
    ze = aa.apply(params, y, method=AudioAlgebra.encode)
    np.testing.assert_allclose(np.asarray(ze), np.asarray(z), rtol=1e-6)


def test_audio_algebra_trivial():
    aa = AudioAlgebra(dims=16, trivial=True)
    y = jnp.ones((1, 16, 4))
    params = aa.init(KEY, y)
    z, yr = aa.apply(params, y)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(y))
    np.testing.assert_array_equal(np.asarray(yr), np.asarray(y))


def test_embed_block_residual_rule():
    blk = EmbedBlock(out_dims=8)
    x8 = jnp.ones((2, 8))
    p = blk.init(KEY, x8)
    out_same = blk.apply(p, x8)
    assert out_same.shape == (2, 8)
    blk2 = EmbedBlock(out_dims=4)
    x = jnp.ones((2, 8))
    out_diff = blk2.apply(blk2.init(KEY, x), x)
    assert out_diff.shape == (2, 4)


def test_ema_update_and_schedule():
    p = {"w": jnp.ones((2, 2))}
    e = {"w": jnp.zeros((2, 2))}
    e2 = ema_update(p, e, 0.9)
    np.testing.assert_allclose(np.asarray(e2["w"]), 0.1, rtol=1e-6)
    sched = EMASchedule(beta=0.9999, power=0.75)
    d0 = float(sched.decay(0))
    d1k = float(sched.decay(1000))
    assert d0 == 0.0 and 0.9 < d1k <= 0.9999


@pytest.mark.slow
def test_unet_cfg1d_shapes_and_cfg():
    net = UNetCFG1d(in_channels=4, channels=8, multipliers=(1, 2), factors=(2,),
                    num_blocks=(1,), attentions=(0, 1), attention_heads=2,
                    attention_features=4, context_embedding_features=16)
    x = jnp.ones((2, 4, 32))
    t = jnp.full((2,), 0.5)
    emb = jax.random.normal(KEY, (2, 1, 16))
    rngs = {"params": KEY, "cfg": jax.random.PRNGKey(1)}
    params = net.init(rngs, x, t, embedding=emb, embedding_mask_proba=0.1)
    v = net.apply(params, x, t, embedding=emb)
    assert v.shape == x.shape
    # CFG doubled-batch path
    v_cfg = net.apply(params, x, t, embedding=emb, embedding_scale=3.0)
    assert v_cfg.shape == x.shape
    # scale=1 equals plain conditional forward
    v1 = net.apply(params, x, t, embedding=emb, embedding_scale=1.0)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v), rtol=1e-5)
    # unconditional (None embedding) works
    v_null = net.apply(params, x, t)
    assert v_null.shape == x.shape
    assert not np.allclose(np.asarray(v_null), np.asarray(v))
    # one embedding conditioning B variations broadcasts...
    v_b1 = net.apply(params, x, t, embedding=emb[:1])
    assert v_b1.shape == x.shape
    # ...but a genuine batch mismatch raises instead of silently
    # conditioning everything on embedding 0
    with pytest.raises(ValueError, match="embedding batch"):
        net.apply(params, jnp.ones((4, 4, 32)), jnp.full((4,), 0.5),
                  embedding=emb)


def test_groupnorm_foldable_keeps_activation_dtype(monkeypatch):
    """The fallback (non-Pallas) GroupNormFoldable path must not promote
    bf16 activations to f32 via its f32 scale/bias params — that would run
    every downstream conv at 2x MXU cost (blocks.GroupNorm1 casts back;
    this class must too)."""
    from audio_algebra_tpu.models.unet_cfg1d import GroupNormFoldable

    monkeypatch.setenv("AA_LDM_GN", "0")
    gn = GroupNormFoldable(groups=4)
    x = jax.random.normal(KEY, (2, 32, 16))
    params = gn.init(KEY, x)
    assert params["params"]["scale"].dtype == jnp.float32
    y = gn.apply(params, x.astype(jnp.bfloat16))
    assert y.dtype == jnp.bfloat16
    # FiLM-conditioned call keeps the dtype too when scale/shift are bf16
    fs = jnp.zeros((2, 1, 16), jnp.bfloat16)
    y2 = gn.apply(params, x.astype(jnp.bfloat16), film_scale=fs,
                  film_shift=fs)
    assert y2.dtype == jnp.bfloat16


def test_unet_cfg1d_remat_flag(monkeypatch):
    """AA_LDM_REMAT=1 (per-block gradient rematerialisation for larger
    training batches) must be a pure memory/schedule knob: identical param
    tree, bit-identical forward, and flowing gradients."""
    net = UNetCFG1d(in_channels=4, channels=8, multipliers=(1, 2), factors=(2,),
                    num_blocks=(1,), attentions=(0, 1), attention_heads=2,
                    attention_features=4, context_embedding_features=16)
    x = jnp.ones((2, 4, 32))
    t = jnp.full((2,), 0.5)
    emb = jax.random.normal(KEY, (2, 1, 16))

    monkeypatch.setenv("AA_LDM_REMAT", "0")
    params = net.init({"params": KEY}, x, t, embedding=emb)
    y_plain = net.apply(params, x, t, embedding=emb)

    monkeypatch.setenv("AA_LDM_REMAT", "1")
    params_r = net.init({"params": KEY}, x, t, embedding=emb)
    keys = [jax.tree_util.keystr(k)
            for k, _ in jax.tree_util.tree_leaves_with_path(params)]
    keys_r = [jax.tree_util.keystr(k)
              for k, _ in jax.tree_util.tree_leaves_with_path(params_r)]
    assert keys == keys_r                      # checkpoints interchangeable
    y_remat = net.apply(params, x, t, embedding=emb)
    np.testing.assert_array_equal(np.asarray(y_plain), np.asarray(y_remat))

    def loss(p):
        return jnp.mean(net.apply(p, x, t, embedding=emb) ** 2)
    g = jax.grad(loss)(params)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


@pytest.mark.slow
def test_dvae_tiny():
    dvae = DiffusionDVAE(latent_dim=8, capacity=4, c_mults=(2, 4), strides=(4, 2),
                         n_attn_layers=1, diffusion_c_mults=(8, 16, 16))
    x = jnp.ones((1, 2, 256))
    t = jnp.ones((1,))
    params = dvae.init(KEY, x, t)
    emb = dvae.apply(params, x, method=DiffusionDVAE.encode_it)
    assert emb.shape == (1, 8, 32)
    assert bool((jnp.abs(emb) <= 1).all())
    v = dvae.apply(params, x, t, emb, method=DiffusionDVAE.decode_v)
    assert v.shape == x.shape


@pytest.mark.slow
def test_dvae_quantized():
    dvae = DiffusionDVAE(latent_dim=8, capacity=4, c_mults=(2,), strides=(4,),
                         num_quantizers=1, num_heads=2, codebook_size=16,
                         n_attn_layers=0, diffusion_c_mults=(8, 8))
    x = jnp.ones((1, 2, 64))
    params = dvae.init(KEY, x, jnp.ones((1,)))
    emb = dvae.apply(params, x, method=DiffusionDVAE.encode_it)
    assert emb.shape == (1, 8, 16)


@pytest.mark.slow
def test_latent_diffae_tiny():
    m = LatentAudioDiffusionAutoencoder(
        latent_dim=8, second_stage_latent_dim=4, factors=(2, 2),
        ae_capacity=4, ae_c_mults=(2, 4), ae_strides=(2, 2),
        latent_channels=8, latent_multipliers=(1, 2, 2),
        latent_num_blocks=(1, 1), diffusion_c_mults=(8, 16, 16),
        diffusion_depth=3)
    x = jnp.ones((1, 2, 256))
    t = jnp.ones((1,))
    params = m.init(KEY, x, t)
    z = m.apply(params, x, method=LatentAudioDiffusionAutoencoder.encode)
    assert z.shape == (1, 4, 256 // (4 * 4))
    assert m.downsampling_ratio == 16


@pytest.mark.slow
def test_stacked_cond_tiny():
    m = StackedAELatentDiffusionCond(
        latent_dim=4, embedding_features=16, channels=8,
        multipliers=(1, 2), factors=(2,), num_blocks=(1,), attentions=(0, 1))
    x = jnp.ones((2, 4, 32))
    t = jnp.full((2,), 0.3)
    emb = jnp.ones((2, 1, 16))
    rngs = {"params": KEY, "cfg": jax.random.PRNGKey(1)}
    params = m.init(rngs, x, t, embedding=emb, embedding_mask_proba=0.1)
    v = m.apply(params, x, t, embedding=emb, embedding_scale=2.0)
    assert v.shape == x.shape


def test_rel_pos_bias_skew_equals_gather():
    """The Toeplitz skew construction in RelPosSelfAttention must equal
    the naive (T,T) bucket gather bit-for-bit (it replaced a gather that
    was 48% of the MIRAGE inner step, see docs/performance.md)."""
    import jax.numpy as jnp
    from audio_algebra_tpu.models.unet_cfg1d import (
        _relative_position_bucket, toeplitz_rel_pos_bias)

    rng = np.random.default_rng(0)
    for heads, t, nb, md in ((3, 17, 8, 16), (2, 64, 32, 128)):
        table = jnp.asarray(rng.standard_normal((nb, heads)), jnp.float32)
        pos = jnp.arange(t)
        ref = jnp.transpose(
            table[_relative_position_bucket(pos[None, :] - pos[:, None],
                                            nb, md)], (2, 0, 1))
        # the PRODUCTION helper (used by RelPosSelfAttention), not a copy
        bias = toeplitz_rel_pos_bias(table, t, nb, md)
        assert jnp.array_equal(bias, ref)
