"""Quasi-random (Sobol) timestep draws for diffusion training.

The reference draws training timesteps from a scrambled 1-D Sobol engine
(`torch.quasirandom.SobolEngine(1, scramble=True)` — reference
DiffusionDVAE.py:131, StackedAELatentDiffusionCond.py:331, drawn at :361):
low-discrepancy t values stratify the noise levels each batch sees, which
reduces gradient variance versus iid uniform. Host-side scipy provides the
same engine; a plain uniform RNG stands in only if scipy is ever absent.
"""
from __future__ import annotations

import warnings

import numpy as np


class SobolSampler:
    """Scrambled Sobol sequence, drawn host-side per training step.

    draw(n) -> float32 (n,) in [0, 1), matching the reference's
    `self.rng.draw(reals.shape[0])[:, 0]`.
    """

    def __init__(self, dim: int = 1, scramble: bool = True, seed: int = 0):
        self.dim = dim
        try:
            from scipy.stats import qmc
            self._engine = qmc.Sobol(d=dim, scramble=scramble, seed=seed)
            self._rng = None
        except Exception:                    # pragma: no cover — scipy is baked in
            self._engine = None
            self._rng = np.random.default_rng(seed)

    def draw(self, n: int) -> np.ndarray:
        if self._engine is None:             # pragma: no cover
            return self._rng.random((n,), dtype=np.float32)
        with warnings.catch_warnings():
            # scipy warns that non-power-of-2 draws lose balance properties;
            # the reference draws batch-size points regardless — same here
            warnings.simplefilter("ignore", UserWarning)
            return self._engine.random(n)[:, 0].astype(np.float32)
