"""Differentiability of the Pallas fused GroupNorm (VERDICT r2 item 3).

Round 2's kernel dispatched unconditionally at MXU-aligned shapes with an
input_output_aliases={0:0} donation and no custom_vjp — `jax.grad` through
any aligned GroupNorm1 raised `NotImplementedError: JVP with aliasing not
supported`, a landmine for every DVAE/stacked fine-tune at real widths
(reference capability: all torch zoo modules are trainable by construction,
reference DiffusionDVAE.py:98-160). Now the standard paths route through a
jax.custom_vjp (forward = Pallas, backward = recompute-based XLA GN+GELU
gradient); these tests pin (a) the exact verdict repro, (b) gradient
CORRECTNESS vs pure-jnp autodiff, (c) a ResConvBlock at real widths, and
(d) a smoke fine-tune step of DiffusionDVAE at 128-aligned channels.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_algebra_tpu.models.blocks import GroupNorm1, ResConvBlock
from audio_algebra_tpu.ops.pallas import groupnorm as pgn


def _jnp_ref_loss(params, x, residual=None, gelu=True):
    """Pure-jnp GN(1)[+tanh-GELU][+residual] — autodiff ground truth."""
    s, b = params["params"]["scale"], params["params"]["bias"]
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
        - jnp.square(mu), 0.0)
    y = (x32 - mu) * jax.lax.rsqrt(var + 1e-6) * s + b
    if gelu:
        y = 0.5 * y * (1.0 + jnp.tanh(0.7978845608028654
                                      * (y + 0.044715 * y ** 3)))
    if residual is not None:
        y = residual.astype(jnp.float32) + y
    return jnp.sum(jnp.square(y))


@pytest.mark.parametrize("shape", [(2, 16, 128), (2, 2048, 256)])
@pytest.mark.parametrize("gelu", [True, False])
def test_grad_matches_jnp_autodiff(shape, gelu, rng):
    assert pgn.supported(shape, jnp.float32)  # must hit the Pallas dispatch
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    m = GroupNorm1(fuse_gelu=gelu)
    p = m.init(jax.random.PRNGKey(0), x)
    # perturb params away from identity so dscale/dbias are non-trivial
    p = jax.tree_util.tree_map(
        lambda a: a + 0.1 * jnp.arange(a.size, dtype=a.dtype) / a.size, p)

    def loss(p, x):
        return jnp.sum(jnp.square(m.apply(p, x)))

    (gp, gx) = jax.grad(loss, argnums=(0, 1))(p, x)
    (rp, rx) = jax.grad(_jnp_ref_loss, argnums=(0, 1))(p, x, gelu=gelu)
    np.testing.assert_allclose(np.asarray(gp["params"]["scale"]),
                               np.asarray(rp["params"]["scale"]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gp["params"]["bias"]),
                               np.asarray(rp["params"]["bias"]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=2e-4, atol=2e-4)


def test_grad_residual_path(rng):
    shape = (2, 256, 128)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    res = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    m = GroupNorm1(fuse_gelu=True)
    p = m.init(jax.random.PRNGKey(0), x)

    def loss(p, x, res):
        return jnp.sum(jnp.square(m.apply(p, x, residual=res)))

    gp, gx, gr = jax.grad(loss, argnums=(0, 1, 2))(p, x, res)
    rp, rx, rr = jax.grad(_jnp_ref_loss, argnums=(0, 1, 2))(p, x, res)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(rr),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gp["params"]["scale"]),
                               np.asarray(rp["params"]["scale"]),
                               rtol=2e-4, atol=2e-4)


def test_grad_under_jit_and_value_and_grad(rng):
    """jit(grad(.)) — the shape every real train step uses."""
    x = jnp.asarray(rng.standard_normal((2, 128, 128)), jnp.float32)
    m = GroupNorm1(fuse_gelu=True)
    p = m.init(jax.random.PRNGKey(0), x)
    f = jax.jit(jax.value_and_grad(
        lambda p: jnp.mean(jnp.square(m.apply(p, x)))))
    v, g = f(p)
    assert np.isfinite(float(v))
    assert np.isfinite(np.asarray(g["params"]["scale"])).all()


def test_resconvblock_grad_real_widths(rng):
    """The exact VERDICT r2 ask: grad an MXU-aligned ResConvBlock at
    (B, T, C) = (2, 2048, 256)."""
    x = jnp.asarray(rng.standard_normal((2, 2048, 256)), jnp.float32)
    m = ResConvBlock(c_mid=256, c_out=256)
    p = m.init(jax.random.PRNGKey(0), x)

    g = jax.grad(lambda p: jnp.mean(jnp.square(m.apply(p, x))))(p)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # the conv kernels must receive signal (grad through BOTH GN passes)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert total > 0.0


@pytest.mark.slow
def test_dvae_finetune_step_real_widths(rng):
    """One v-objective fine-tune step of DiffusionDVAE with 128-aligned
    UNet channels — the path round 2's kernel made untrainable."""
    import optax
    from audio_algebra_tpu.models.dvae import DiffusionDVAE

    model = DiffusionDVAE(latent_dim=64, io_channels=2, capacity=4,
                          c_mults=(2, 4, 8, 16, 32), strides=(4, 4, 2, 2, 2),
                          n_attn_layers=0, diffusion_c_mults=(256, 256))
    audio = jnp.asarray(rng.standard_normal((1, 2, 2048)), jnp.float32)
    t = jnp.asarray([0.4], jnp.float32)
    params = model.init(jax.random.PRNGKey(0), audio, t)

    def loss_fn(p, key):
        emb = model.apply(p, audio, method=model.encode_it)
        tt = jax.random.uniform(key, (audio.shape[0],))
        alpha, sigma = jnp.cos(tt * jnp.pi / 2), jnp.sin(tt * jnp.pi / 2)
        noise = jax.random.normal(jax.random.fold_in(key, 1), audio.shape)
        noised = (alpha[:, None, None] * audio
                  + sigma[:, None, None] * noise)
        v_target = (alpha[:, None, None] * noise
                    - sigma[:, None, None] * audio)
        v = model.apply(p, noised, tt, emb, method=model.decode_v)
        return jnp.mean(jnp.square(v - v_target))

    opt = optax.adam(1e-4)
    state = opt.init(params)
    loss, grads = jax.value_and_grad(loss_fn)(params, jax.random.PRNGKey(1))
    updates, state = opt.update(grads, state, params)
    new_params = optax.apply_updates(params, updates)
    assert np.isfinite(float(loss))
    # the update actually moved the diffusion UNet's params
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), params, new_params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0
