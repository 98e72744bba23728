"""Pallas kernel tests (interpreter mode on CPU; compiled path exercised on
real TPU by bench/demo runs)."""
import numpy as np
import jax.numpy as jnp
import pytest

from audio_algebra_tpu.ops.pallas.stft_kernel import pallas_stft
from audio_algebra_tpu.ops.stft import stft


@pytest.mark.parametrize("shape,nfft,hop", [
    ((2, 16384), 1024, 256),
    ((1, 2, 8192), 512, 128),
    ((3, 4096), 1024, 256),     # n_frames not a multiple of the tile
])
def test_pallas_stft_matches_reference(shape, nfft, hop):
    x = jnp.asarray(np.random.default_rng(0).standard_normal(shape).astype(np.float32))
    ref = stft(x, nfft, hop)
    ours = pallas_stft(x, nfft, hop, interpret=True)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=5e-4, rtol=1e-4)


def test_pallas_stft_no_center():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 8192)).astype(np.float32))
    ref = stft(x, 1024, 256, center=False)
    ours = pallas_stft(x, 1024, 256, center=False, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=5e-4, rtol=1e-4)
