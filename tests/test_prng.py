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
