"""Host-side PRNG helpers (utils/prng.py): bit-identity with jax.random.

The helpers exist because an EAGER PRNGKey dispatch through the axon relay
measured 388 s (utils/prng.py docstring); correctness contract is that the
CPU-backend threefry produces bit-identical keys, so fixed-seed goldens
are unaffected by where the key math runs.
"""
import jax
import jax.numpy as jnp
import numpy as np

from audio_algebra_tpu.utils.prng import host_fold_in, host_key, host_split


def test_host_key_bit_identical():
    for seed in (0, 1, 12345):
        np.testing.assert_array_equal(host_key(seed),
                                      np.asarray(jax.random.PRNGKey(seed)))


def test_host_split_bit_identical():
    k = jax.random.PRNGKey(7)
    np.testing.assert_array_equal(host_split(np.asarray(k), 3),
                                  np.asarray(jax.random.split(k, 3)))


def test_host_fold_in_bit_identical():
    k = jax.random.PRNGKey(3)
    np.testing.assert_array_equal(host_fold_in(np.asarray(k), 11),
                                  np.asarray(jax.random.fold_in(k, 11)))


def test_host_key_feeds_jitted_random():
    # numpy keys flow into jitted device programs unchanged
    out = jax.jit(lambda key: jax.random.normal(key, (4,)))(host_key(0))
    ref = jax.jit(lambda key: jax.random.normal(key, (4,)))(
        jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_trace_safe_fallback():
    # host_key under a trace returns the traced key rather than crashing
    def f(x):
        # under a trace the inner split inlines into the jaxpr and produces
        # a tracer; _on_cpu must hand it back instead of forcing numpy
        k = host_split(host_key(0))[0]
        return x + jax.random.normal(jnp.asarray(k), x.shape)

    jax.jit(f)(jnp.zeros((2,)))  # must trace and run without error


def test_host_normal_bit_identical_and_uncommitted():
    from audio_algebra_tpu.utils.prng import host_normal
    k = host_key(7)
    got = host_normal(k, (3, 5), jnp.float32)
    ref = jax.random.normal(jnp.asarray(k), (3, 5), jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # uncommitted host output: consuming jits must not change cache keys
    assert isinstance(got, np.ndarray)
    # bf16 draws come back as numpy with the ml_dtypes bfloat16 dtype
    gb = host_normal(k, (4,), jnp.bfloat16)
    assert isinstance(gb, np.ndarray) and gb.dtype == jnp.bfloat16


def test_host_normal_traced_key_stays_in_graph():
    from audio_algebra_tpu.utils.prng import host_normal

    def f(key):
        return host_normal(key, (4,), jnp.float32)

    out = jax.jit(f)(jnp.asarray(host_key(3)))
    ref = jax.random.normal(jnp.asarray(host_key(3)), (4,))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_host_cast_uncommitted_numpy():
    from audio_algebra_tpu.utils.prng import host_cast
    x = np.linspace(-1, 1, 8, dtype=np.float32)
    y = host_cast(x, jnp.bfloat16)
    assert isinstance(y, np.ndarray) and y.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y, np.float32), x, atol=0.01)
    z = host_cast([1, 2, 3], jnp.float32)
    assert isinstance(z, np.ndarray) and z.dtype == np.float32
