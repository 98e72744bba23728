"""End-to-end generation golden: a fixed-seed tiny-model CLAPDAE.generate()
fingerprint pinned in tests/goldens/generation.json.

Purpose (VERDICT r2 item 9): perf surgery on the serving path (sequence
folds, int8 emission, rel-pos hoists, jit re-plumbing) must not silently
drift the *numerics* of the full generate pipeline — the fold==unfold
asserts only cover individual kernels. Any change to the sampled values
beyond float-accumulation noise turns this test red; regenerate the golden
(and justify the numeric change) with:

    python tools/make_goldens.py --generation

The pipeline pinned here is the reference's MIRAGE path (reference
given_models.py:612-647): CFG DPM++(2M) latent sampling -> outer v-DDIM
stage-1 decode -> AE decode, on deterministic random weights (seeded
fast_random_params) with a fixed embedding and fixed PRNG key chain.
"""
import json
from pathlib import Path

import numpy as np
import pytest

from audio_algebra_tpu.given_models import CLAPDAE

from test_given_models import TINY_CLAPDAE

GOLDEN = Path(__file__).parent / "goldens" / "generation.json"

SEED = 1234
DEMO_STEPS = 4
OUTER_STEPS = 3
CFG_SCALE = 2.0


def run_tiny_generation():
    """The exact pipeline the golden pins. Shared with tools/make_goldens."""
    w = CLAPDAE(**TINY_CLAPDAE, seed=SEED)
    w.demo_samples = 4096
    rng = np.random.default_rng(99)
    emb = rng.standard_normal((1, 1, 512)).astype(np.float32)
    emb /= np.linalg.norm(emb)
    fakes, latents = w.generate(emb, cfg_scales=CFG_SCALE,
                                demo_steps=DEMO_STEPS,
                                outer_steps=OUTER_STEPS)
    return np.asarray(fakes, np.float64), np.asarray(latents, np.float64)


def fingerprint(fakes: np.ndarray, latents: np.ndarray) -> dict:
    """Drift-sensitive but float-jitter-tolerant summary of one run."""
    stride = max(fakes.size // 64, 1)
    return {
        "fakes_shape": list(fakes.shape),
        "latents_shape": list(latents.shape),
        "fakes_sample": np.round(fakes.ravel()[::stride][:64], 6).tolist(),
        "fakes_rms": float(np.sqrt(np.mean(fakes ** 2))),
        "latents_rms": float(np.sqrt(np.mean(latents ** 2))),
        "latents_mean_abs": float(np.mean(np.abs(latents))),
    }


def test_generation_matches_golden():
    if not GOLDEN.exists():
        pytest.skip("no generation golden committed "
                    "(run tools/make_goldens.py --generation)")
    want = json.loads(GOLDEN.read_text())
    fakes, latents = run_tiny_generation()
    got = fingerprint(fakes, latents)
    assert got["fakes_shape"] == want["fakes_shape"]
    assert got["latents_shape"] == want["latents_shape"]
    # tolerances: ~1e-5 float32 accumulation jitter allowed; real numeric
    # drift (a changed schedule, a changed fold, a changed key path) moves
    # these by orders of magnitude more
    np.testing.assert_allclose(got["fakes_sample"], want["fakes_sample"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got["fakes_rms"], want["fakes_rms"],
                               rtol=1e-4)
    np.testing.assert_allclose(got["latents_rms"], want["latents_rms"],
                               rtol=1e-4)
    np.testing.assert_allclose(got["latents_mean_abs"],
                               want["latents_mean_abs"], rtol=1e-4)


def test_generation_is_deterministic():
    """Two runs with the same seed are bit-identical — the property the
    golden depends on (PRNG chain is explicit, no global state)."""
    f1, l1 = run_tiny_generation()
    f2, l2 = run_tiny_generation()
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(l1, l2)
