"""Sampler correctness via oracle models.

For the v-objective, a model that returns the exact v for a fixed clean
signal x0 — v = alpha*eps_implied - sigma*x0 with eps_implied recovered from
the current x — makes DDIM's denoised prediction equal x0 *identically* at
every step. So samplers must return x0 to float precision; this pins the
schedule/update algebra far harder than statistical tests.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np

from audio_algebra_tpu.samplers import (
    get_alphas_sigmas, get_crash_schedule, alpha_sigma_to_t,
    sample, sample_manual, resample_diffusion,
    VDenoiser, get_sigmas_polyexponential, sample_dpmpp_2m, kdiff_sample,
)

KEY = jax.random.PRNGKey(0)
X0 = jax.random.normal(jax.random.PRNGKey(42), (2, 4, 16))


def oracle_v(x, t, **kwargs):
    """Perfect v-predictor for clean signal X0."""
    alpha, sigma = get_alphas_sigmas(t)
    alpha = alpha.reshape(-1, 1, 1)
    sigma = sigma.reshape(-1, 1, 1)
    eps = (x - alpha * X0) / jnp.maximum(sigma, 1e-8)
    return alpha * eps - sigma * X0


def test_schedule_math_matches_reference_formulas():
    t = np.linspace(0.01, 0.99, 17)
    a, s = get_alphas_sigmas(jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(a), np.cos(t * math.pi / 2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s), np.sin(t * math.pi / 2), rtol=1e-5, atol=1e-6)
    # crash schedule: sigma' = sin^2, alpha' = sqrt(1 - sigma'^2)
    tc = np.asarray(get_crash_schedule(jnp.asarray(t)))
    sig = np.sin(t * math.pi / 2) ** 2
    alp = np.sqrt(1 - sig**2)
    np.testing.assert_allclose(tc, np.arctan2(sig, alp) / math.pi * 2, rtol=1e-5)
    # t <-> (alpha, sigma) inverse
    np.testing.assert_allclose(np.asarray(alpha_sigma_to_t(a, s)), t, rtol=1e-5)


def test_vddim_sample_recovers_oracle_signal():
    noise = jax.random.normal(KEY, X0.shape)
    for steps in (2, 10, 35):
        out = sample(oracle_v, noise, steps, 0.0, None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(X0),
                                   atol=1e-3, rtol=1e-3)


def test_vddim_sample_eta_still_converges():
    noise = jax.random.normal(KEY, X0.shape)
    out = sample(oracle_v, noise, 20, 0.5, None, key=jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(out), np.asarray(X0), atol=1e-2)


def test_sample_manual_with_step_list():
    noise = jax.random.normal(KEY, X0.shape)
    steps = 16
    t = jnp.linspace(1.0, 0.0, steps + 1)[:-1]
    out = sample_manual(oracle_v, noise, steps, 0.0, step_list=t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(X0), atol=1e-3)


def test_sample_jits_as_one_program():
    noise = jax.random.normal(KEY, X0.shape)
    f = jax.jit(lambda n: sample(oracle_v, n, 35, 0.0, None))
    out = f(noise)
    np.testing.assert_allclose(np.asarray(out), np.asarray(X0), atol=1e-3)


def test_resample_diffusion_low_noise_preserves():
    out = resample_diffusion(oracle_v, X0, steps=50, noise_level=0.2,
                             key=jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(X0), atol=1e-2)


def test_resample_diffusion_empty_schedule():
    """Few steps x low noise_level truncate the schedule to zero model
    evaluations (steps=2, noise_level=0.5) — must return the partially
    noised latents, not crash on a length-0 fori_loop (regression)."""
    out = resample_diffusion(oracle_v, X0, steps=2, noise_level=0.5,
                             key=jax.random.PRNGKey(4))
    assert out.shape == X0.shape
    assert np.isfinite(np.asarray(out)).all()


def test_vdenoiser_consistency():
    den = VDenoiser(oracle_v)
    # at any sigma, the denoised estimate of a consistent noisy input is X0
    sigma = jnp.asarray([0.5, 2.0])
    n = jax.random.normal(KEY, X0.shape)
    x = X0 + sigma.reshape(-1, 1, 1) * n
    out = den(x, sigma)
    np.testing.assert_allclose(np.asarray(out), np.asarray(X0), atol=1e-4)
    # sigma<->t inverses
    t = den.sigma_to_t(sigma)
    np.testing.assert_allclose(np.asarray(den.t_to_sigma(t)), np.asarray(sigma),
                               rtol=1e-5)


def test_polyexponential_sigmas():
    s = np.asarray(get_sigmas_polyexponential(10, 0.11, 50.0))
    assert s.shape == (11,)
    assert abs(s[0] - 50.0) < 1e-4 and abs(s[9] - 0.11) < 1e-5 and s[10] == 0
    assert (np.diff(s) < 0).all()


def test_dpmpp_2m_recovers_oracle():
    den = VDenoiser(oracle_v)
    sigmas = get_sigmas_polyexponential(25, 0.11, 50.0)
    noise = jax.random.normal(KEY, X0.shape) * sigmas[0]
    out = sample_dpmpp_2m(den, noise, sigmas)
    np.testing.assert_allclose(np.asarray(out), np.asarray(X0), atol=2e-2)


def test_kdiff_sample_wrapper():
    noise = jax.random.normal(KEY, X0.shape)
    out = kdiff_sample(oracle_v, noise, steps=25)
    np.testing.assert_allclose(np.asarray(out), np.clip(np.asarray(X0), -1, 1),
                               atol=2e-2)


def test_kdiff_sample_preserves_bf16():
    """The production serving path runs half(): a bf16 latent must stay
    bf16 through VDenoiser and the whole DPM++(2M) scan (an f32 promotion
    here silently ran all 150 MIRAGE inner steps in f32 — round-2 review
    finding), and the bf16 trajectory must track the f32 one."""
    import jax
    import jax.numpy as jnp
    from audio_algebra_tpu.samplers.kdiff import kdiff_sample

    seen = []

    def model_fn(x, t, **kw):
        seen.append((x.dtype, t.dtype))
        return 0.1 * x - 0.05 * jnp.sin(x)

    lat = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 64), jnp.float32)
    ref = kdiff_sample(model_fn, lat, 12)
    assert ref.dtype == jnp.float32
    seen.clear()
    got = kdiff_sample(model_fn, lat.astype(jnp.bfloat16), 12)
    assert got.dtype == jnp.bfloat16
    assert all(xd == jnp.bfloat16 and td == jnp.bfloat16 for xd, td in seen)
    rel = float(jnp.sqrt(jnp.mean((got.astype(jnp.float32) - ref) ** 2)
                         / jnp.mean(ref ** 2)))
    assert rel < 0.05, rel
