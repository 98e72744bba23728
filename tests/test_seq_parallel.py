"""Sequence-parallel primitives (parallel/seq.py): shard the TIME axis over
a mesh, parity-checked against the unsharded ops on the 8-device CPU mesh.
The reference handles long sequences only by chunking; these are the
SURVEY §5 stretch goal (shard the latent/time axis via shard_map)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from audio_algebra_tpu.parallel import make_mesh
from audio_algebra_tpu.parallel.seq import (conv1d_seq, groupnorm1_seq,
                                            resconv_block_seq)
from audio_algebra_tpu.models.blocks import conv1d, ResConvBlock
from audio_algebra_tpu.utils.params import fast_random_params


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(n_devices=8)


def _sharded(x, mesh):
    return jax.device_put(x, NamedSharding(mesh, P(None, "data", None)))


def test_conv1d_seq_matches_unsharded(mesh):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 1024, 16))
    w = jax.random.normal(jax.random.PRNGKey(1), (5, 16, 24)) * 0.1
    ref = conv1d(x, w)
    out = conv1d_seq(_sharded(x, mesh), w, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # the result itself is time-sharded over the mesh
    assert {s.data.shape for s in out.addressable_shards} == {(2, 128, 24)}


@pytest.mark.parametrize("k", [1, 2, 3, 4, 5, 7])
def test_conv1d_seq_any_kernel(mesh, k):
    """Parity for every kernel size, including even K (XLA SAME padding is
    asymmetric: (K-1)//2 low / K//2 high) and the halo-free K=1 case."""
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 512, 8))
    w = jax.random.normal(jax.random.PRNGKey(3), (k, 8, 8)) * 0.2
    ref = conv1d(x, w)
    out = conv1d_seq(_sharded(x, mesh), w, mesh)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_groupnorm1_seq_matches_unsharded(mesh):
    from flax import linen as nn
    x = jax.random.normal(jax.random.PRNGKey(4), (3, 512, 32)) * 2 + 0.5
    scale = jnp.linspace(0.5, 1.5, 32)
    bias = jnp.linspace(-0.2, 0.2, 32)
    gn = nn.GroupNorm(num_groups=1, epsilon=1e-6)
    ref = nn.gelu(gn.apply({"params": {"scale": scale, "bias": bias}}, x))
    out = groupnorm1_seq(_sharded(x, mesh), scale, bias, mesh, gelu=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_resconv_block_seq_matches_module(mesh):
    """A full ResConvBlock sequence-parallel == the flax module (same
    params), proving an oversized window can run across chips instead of
    being chunked."""
    blk = ResConvBlock(32, 32)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 1024, 32)) * 0.5
    params = fast_random_params(blk, 1, jnp.zeros((1, 8, 32)))
    ref = blk.apply(params, x)
    out = resconv_block_seq(_sharded(x, mesh), params, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
