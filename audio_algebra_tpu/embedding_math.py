"""CLAP-embedding combination math + the warm model cache for serving.

This is the package home of the MIRAGE app's embedding operations
(reference mirage.py:156-179 slerp/lerp, :375-381 weighted algebra,
:127-153 model cache) so that the serving endpoint (serve.py) works from
the *installed* package — the repo-root `mirage.py` CLI re-exports these
for its own use and for script-level importers.
"""
from __future__ import annotations

from typing import Optional, Sequence

__all__ = ["lerp", "slerp", "interp_embeddings", "weighted_algebra",
           "get_model_ready"]

_model_cache: dict = {}


def get_model_ready(model_choice: str = "22s", device=None,
                    verbose: bool = True, half: bool = True, **model_kwargs):
    """Model cache keyed by choice (reference mirage.py:127-153); `half`
    casts the diffusion stages to bf16 (the reference app's fp16 default,
    reference mirage.py:113-124/264)."""
    key = (model_choice, half)
    if key not in _model_cache:
        from .given_models import CLAPDAE
        if verbose:
            print(f"get_model_ready: instantiating CLAPDAE ({model_choice})")
        model = CLAPDAE(**model_kwargs)
        model.setup(gdrive=False, model_len=model_choice)
        if half:
            model.half()
        _model_cache[key] = model
    return _model_cache[key]


def lerp(a, b, t):
    """Linear interpolation (reference mirage.py:156-158)."""
    return a * (1 - t) + b * t


def slerp(a, b, t, dot_threshold: float = 0.9995):
    """Spherical interpolation (reference mirage.py:160-170)."""
    import jax.numpy as jnp
    a, b = jnp.asarray(a), jnp.asarray(b)
    dot = jnp.sum(a * b) / jnp.maximum(
        jnp.linalg.norm(a) * jnp.linalg.norm(b), 1e-8)
    if float(jnp.abs(dot)) > dot_threshold:
        return lerp(a, b, t)
    theta0 = jnp.arccos(jnp.clip(dot, -1, 1))
    theta = theta0 * t
    s0 = jnp.sin(theta0 - theta) / jnp.sin(theta0)
    s1 = jnp.sin(theta) / jnp.sin(theta0)
    return s0 * a + s1 * b


def interp_embeddings(emb1, emb2, interp_scale: float = 0.5,
                      interp_type: str = "slerp"):
    """(reference mirage.py:172-179)"""
    if interp_type == "lerp":
        return lerp(emb1, emb2, interp_scale)
    return slerp(emb1, emb2, interp_scale)


def weighted_algebra(embeddings: Sequence, weights: Sequence[float]):
    """Σ wᵢ·embᵢ, renormalised — "AUDIO ALLLLGEEEBRRAA"
    (reference mirage.py:375-381)."""
    import jax.numpy as jnp
    total = None
    for emb, w in zip(embeddings, weights):
        term = jnp.asarray(emb) * w
        total = term if total is None else total + term
    norm = jnp.linalg.norm(total)
    return total / jnp.maximum(norm, 1e-8)
