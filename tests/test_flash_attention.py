"""Flash attention (ops/pallas/flash_attention.py) vs the unblocked XLA
reference — interpret mode on CPU; the same kernel runs compiled on the
chip in the serving path (RelPosSelfAttention at long T)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_algebra_tpu.ops.pallas.flash_attention import (
    flash_attention_relpos, flash_attention_relpos_ref, flash_ok)


def _inputs(b, h, t, d, dtype, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (b, h, t, d), dtype)
    k = jax.random.normal(ks[1], (b, h, t, d), dtype)
    v = jax.random.normal(ks[2], (b, h, t, d), dtype)
    bias = 2.0 * jax.random.normal(ks[3], (h, t, t), jnp.float32)
    return q, k, v, bias


@pytest.mark.parametrize("b,h,t,d", [(2, 4, 1024, 64), (1, 2, 1536, 64)])
def test_flash_matches_reference_f32(b, h, t, d):
    q, k, v, bias = _inputs(b, h, t, d, jnp.float32)
    out = flash_attention_relpos(q, k, v, jnp.swapaxes(bias, 1, 2),
                                 sm_scale=d ** -0.5, interpret=True)
    want = flash_attention_relpos_ref(q, k, v, bias, sm_scale=d ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_matches_reference_bf16_bias_bf16():
    """Serving config: bf16 q/k/v AND bf16 bias tiles (the HBM halving)."""
    b, h, t, d = 2, 4, 1024, 64
    q, k, v, bias = _inputs(b, h, t, d, jnp.bfloat16)
    out = flash_attention_relpos(
        q, k, v, jnp.swapaxes(bias, 1, 2).astype(jnp.bfloat16),
        sm_scale=d ** -0.5, interpret=True)
    want = flash_attention_relpos_ref(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        bias, sm_scale=d ** -0.5)
    # bf16 inputs + bf16 PV matmul: ~1e-2 elementwise agreement expected
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.05, atol=0.05)


def test_flash_online_softmax_stability():
    """Large score magnitudes across kv blocks must not overflow: the
    running-max rescale is what makes the single pass correct."""
    b, h, t, d = 1, 1, 1024, 64
    q, k, v, bias = _inputs(b, h, t, d, jnp.float32, seed=3)
    # put the row max in the LAST kv block so m gets updated mid-scan
    bias = bias.at[:, :, -256:].add(60.0)
    out = flash_attention_relpos(q, k, v, jnp.swapaxes(bias, 1, 2),
                                 interpret=True)
    want = flash_attention_relpos_ref(q, k, v, bias)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_ok_gate():
    assert flash_ok(1024) and flash_ok(3072) and flash_ok(1536)
    assert not flash_ok(384)      # small T: XLA path
    assert not flash_ok(96)
    assert not flash_ok(1025)     # not block-divisible


def test_toeplitz_transposed_is_transpose():
    from audio_algebra_tpu.models.unet_cfg1d import toeplitz_rel_pos_bias
    table = jax.random.normal(jax.random.PRNGKey(0), (32, 4))
    b = toeplitz_rel_pos_bias(table, 64, 32, 128)
    bT = toeplitz_rel_pos_bias(table, 64, 32, 128, transposed=True)
    np.testing.assert_allclose(np.asarray(bT),
                               np.swapaxes(np.asarray(b), 1, 2),
                               rtol=0, atol=0)


def test_flash_train_forward_matches_reference():
    from audio_algebra_tpu.ops.pallas.flash_attention import \
        flash_attention_relpos_train
    b, h, t, d = 2, 3, 1024, 64
    q, k, v, bias = _inputs(b, h, t, d, jnp.float32, seed=5)
    out = flash_attention_relpos_train(q, k, v, jnp.swapaxes(bias, 1, 2),
                                       d ** -0.5, 512, True)
    want = flash_attention_relpos_ref(q, k, v, bias, sm_scale=d ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_train_grads_match_reference():
    """dq/dk/dv/d(biasT) from the custom-VJP kernels vs jax.grad through
    the unblocked XLA reference — the correctness core of the training
    path (the bucket-table grad rides on d(biasT))."""
    from audio_algebra_tpu.ops.pallas.flash_attention import \
        flash_attention_relpos_train
    b, h, t, d = 2, 2, 1024, 64
    q, k, v, bias = _inputs(b, h, t, d, jnp.float32, seed=7)
    biasT = jnp.swapaxes(bias, 1, 2)
    cot = jax.random.normal(jax.random.PRNGKey(9), (b, h, t, d))

    def loss_flash(q, k, v, biasT):
        o = flash_attention_relpos_train(q, k, v, biasT, d ** -0.5, 512,
                                         True)
        return jnp.sum(o * cot)

    def loss_ref(q, k, v, biasT):
        o = flash_attention_relpos_ref(q, k, v,
                                       jnp.swapaxes(biasT, 1, 2),
                                       sm_scale=d ** -0.5)
        return jnp.sum(o * cot)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, biasT)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, biasT)
    for gf, gr, name in zip(g_flash, g_ref, ("dq", "dk", "dv", "dbiasT")):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_module_train_flash_grad_parity(monkeypatch):
    """RelPosSelfAttention under AA_TRAIN_FLASH: module output AND
    parameter grads (incl. the bucket table through the transposed
    toeplitz) match the XLA path."""
    from audio_algebra_tpu.models.unet_cfg1d import RelPosSelfAttention
    mod = RelPosSelfAttention(heads=2, head_features=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 512, 64)) * 0.5
    params = mod.init(jax.random.PRNGKey(1), x)

    def loss(p):
        return jnp.sum(jnp.square(mod.apply(p, x)))

    monkeypatch.setenv("AA_TRAIN_FLASH", "0")
    want_l, want_g = jax.value_and_grad(loss)(params)
    monkeypatch.setenv("AA_TRAIN_FLASH", "interpret")
    got_l, got_g = jax.value_and_grad(loss)(params)
    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-4)
    jax.tree_util.tree_map(
        lambda ga, gb: np.testing.assert_allclose(
            np.asarray(gb), np.asarray(ga), rtol=3e-3, atol=3e-3),
        want_g, got_g)


def test_precompute_emits_transposed_and_unet_forward_matches(monkeypatch):
    """Full serving wiring: precompute_rel_biases marks flash-eligible
    sites with TransposedBias; the UNetCFG1d forward consuming that dict
    under flash (interpret) matches the plain XLA forward."""
    from audio_algebra_tpu.models.unet_cfg1d import (
        UNetCFG1d, precompute_rel_biases, TransposedBias)
    model = UNetCFG1d(in_channels=4, channels=16, multipliers=(1, 1),
                      factors=(1,), num_blocks=(1,), attentions=(0, 1),
                      attention_heads=2, attention_features=16,
                      resnet_groups=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 1024))
    t = jnp.array([0.4])
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 512))
    params = model.init(
        {"params": jax.random.PRNGKey(2), "cfg": jax.random.PRNGKey(3)},
        x, t, embedding=emb)

    monkeypatch.setenv("AA_FLASH_ATTN", "0")
    want = model.apply(params, x, t, embedding=emb)

    monkeypatch.setenv("AA_FLASH_ATTN", "interpret")
    rb = precompute_rel_biases(model, params["params"], 1024)
    assert any(isinstance(v, TransposedBias) for v in rb.values()), \
        "flash-eligible site should hoist a TransposedBias"
    got = model.apply(params, x, t, embedding=emb, rel_biases=rb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_relpos_attention_trainable_at_flash_lengths(monkeypatch):
    """Training traces (bias=None — no hoisted bias) must stay on the
    differentiable XLA path even at flash-eligible T: the pallas kernel is
    forward-only and jax.grad through it raises. Regression for the r4
    bench probe that hit the pallas AD assert at batch 32."""
    from audio_algebra_tpu.models.unet_cfg1d import RelPosSelfAttention
    monkeypatch.setenv("AA_FLASH_ATTN", "auto")
    mod = RelPosSelfAttention(heads=2, head_features=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1024, 32))
    params = mod.init(jax.random.PRNGKey(1), x)
    g = jax.grad(lambda p: mod.apply(p, x).sum())(params)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


def test_relpos_attention_module_flash_parity(monkeypatch):
    """RelPosSelfAttention with AA_FLASH_ATTN forced on (interpret) must
    match the default XLA path bit-for-bit-ish at the module level."""
    from audio_algebra_tpu.models.unet_cfg1d import (RelPosSelfAttention,
                                                     toeplitz_rel_pos_bias)
    b, t, c = 2, 1024, 256
    mod = RelPosSelfAttention(heads=4, head_features=64)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, c), jnp.float32)
    params = mod.init(jax.random.PRNGKey(1), x)
    table = params["params"]["rel_pos_bias"]
    bias = toeplitz_rel_pos_bias(table, t, mod.num_buckets, mod.max_distance)

    monkeypatch.delenv("AA_FLASH_ATTN", raising=False)
    want = mod.apply(params, x, bias)
    monkeypatch.setenv("AA_FLASH_ATTN", "interpret")
    got = mod.apply(params, x, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
