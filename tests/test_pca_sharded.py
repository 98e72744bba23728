"""Sharded streaming-covariance test on the 8-device mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from calc_effects_pca import make_streaming_cov_step, finalize_cov, sorted_eig
from audio_algebra_tpu.parallel import make_mesh


def encode_fn(x):
    """Linear stand-in encoder (b, 2, t) -> (b, 4, t//16)."""
    w = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4)), jnp.float32)
    return jnp.einsum("bct,cd->bdt", x[..., ::16], w)


def test_sharded_cov_matches_single_device():
    rng = np.random.default_rng(1)
    batches = [rng.standard_normal((16, 2, 256)).astype(np.float32)
               for _ in range(3)]

    def run(mesh):
        step = make_streaming_cov_step(encode_fn, mesh)
        cov_num = jnp.zeros((4, 4))
        mean_num = jnp.zeros((4,))
        count = jnp.zeros(())
        for b in batches:
            cov_num, mean_num, count = step(cov_num, mean_num, count,
                                            jnp.asarray(b))
        return finalize_cov(cov_num, mean_num, count)

    cov_single = run(None)
    cov_sharded = run(make_mesh())
    np.testing.assert_allclose(cov_sharded, cov_single, rtol=1e-4, atol=1e-6)
    vals, vecs = sorted_eig(cov_sharded)
    assert (np.diff(vals) <= 1e-9).all()      # descending


def test_sorted_eig_descending():
    m = np.diag([1.0, 5.0, 3.0])
    vals, vecs = sorted_eig(m)
    np.testing.assert_allclose(vals, [5.0, 3.0, 1.0])
    # eigenvector of the top value is e_1
    assert abs(abs(vecs[1, 0]) - 1.0) < 1e-9
