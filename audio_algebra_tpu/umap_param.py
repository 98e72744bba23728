"""Parametric UMAP-style neighbor embedding, jitted end-to-end.

The reference's effects_explorer.ipynb builds UMAP and AlignedUMAP views
of effect-embedding geometry (cells 57-134) via umap-learn (absent in
this image). This module rebuilds the capability TPU-first:

  * exact kNN graph + UMAP's smooth-k fuzzy kernel (per-point sigma by
    vectorized binary search to hit log2(k) connectivity), all in jax;
  * a parametric map — a small MLP f: R^D -> R^2 trained with the UMAP
    cross-entropy (attractive edges sampled by weight, uniform negative
    samples) as ONE `lax.scan` of adam steps — no Python loop;
  * alignment across knob sweeps for free: umap-learn needs AlignedUMAP's
    anchored joint optimisation because its embeddings are per-dataset
    free variables; a parametric map embeds ANY point set consistently,
    so applying `transform` per sweep yields aligned maps by
    construction.

Curve constants (a, b) follow UMAP's min_dist=0.1 fit; q(d) =
(1 + a d^(2b))^-1.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# UMAP's fitted curve for min_dist=0.1, spread=1.0
_A, _B = 1.577, 0.895


def knn_graph(x: jnp.ndarray, k: int = 10) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact kNN of row vectors + UMAP fuzzy edge weights.

    Returns (indices (N, k), weights (N, k)). Weight kernel:
    exp(-(d - rho)/sigma), rho = nearest-neighbor distance, sigma solved
    per point (binary search) so sum_j w_ij = log2(k).
    """
    n = x.shape[0]
    sq = jnp.sum(x * x, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2 * x @ x.T
    d2 = jnp.maximum(d2, 0.0)
    d2 = d2 + jnp.eye(n) * 1e12                    # exclude self
    d = jnp.sqrt(d2)
    neg_top, idx = jax.lax.top_k(-d, k)            # (N, k) ascending dist
    nd = -neg_top
    rho = nd[:, :1]
    target = math.log2(max(k, 2))

    def weight(sigma):
        return jnp.exp(-jnp.maximum(nd - rho, 0.0) / sigma[:, None])

    lo = jnp.full((n,), 1e-6)
    hi = jnp.full((n,), 1e3)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        s = weight(mid).sum(axis=1)
        too_big = s > target
        return jnp.where(too_big, lo, mid), jnp.where(too_big, mid, hi)

    lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
    sigma = 0.5 * (lo + hi)
    return idx, weight(sigma)


def _init_mlp(key, dims):
    params = []
    for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
        key, sub = jax.random.split(key)
        w = jax.random.normal(sub, (a, b)) * jnp.sqrt(2.0 / a)
        params.append({"w": w, "b": jnp.zeros((b,))})
    return params


def _mlp(params, x):
    h = x
    for i, lyr in enumerate(params):
        h = h @ lyr["w"] + lyr["b"]
        if i < len(params) - 1:
            h = jax.nn.relu(h)
    return h


@partial(jax.jit, static_argnames=("k", "steps", "batch_edges",
                                   "neg_per_edge", "n_components", "hidden"))
def _fit(x, key, k: int, steps: int, batch_edges: int, neg_per_edge: int,
         n_components: int, hidden: Tuple[int, ...], lr: float):
    import optax

    n, dim = x.shape
    idx, w = knn_graph(x, k=k)
    # flatten the edge list; sampling probability proportional to weight
    heads = jnp.repeat(jnp.arange(n), k)
    tails = idx.reshape(-1)
    logits = jnp.log(jnp.maximum(w.reshape(-1), 1e-12))

    params = _init_mlp(key, (dim,) + tuple(hidden) + (n_components,))
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(p, hk, tk, nk):
        eh, et = _mlp(p, x[hk]), _mlp(p, x[tk])
        d2 = jnp.sum((eh - et) ** 2, axis=-1)
        # exp(b*log(x)) rather than jnp.power: float-exponent pow is
        # unsupported on the axon backend (see .claude/skills/verify)
        q = 1.0 / (1.0 + _A * jnp.exp(_B * jnp.log(jnp.maximum(d2, 1e-10))))
        attract = -jnp.log(jnp.maximum(q, 1e-10)).mean()
        en = _mlp(p, x[nk])                         # (E*neg, C)
        ehr = jnp.repeat(eh, neg_per_edge, axis=0)
        d2n = jnp.sum((ehr - en) ** 2, axis=-1)
        qn = 1.0 / (1.0 + _A * jnp.exp(_B * jnp.log(jnp.maximum(d2n, 1e-10))))
        repel = -jnp.log(jnp.maximum(1.0 - qn, 1e-10)).mean()
        return attract + repel

    def step(carry, skey):
        p, s = carry
        k1, k2 = jax.random.split(skey)
        e = jax.random.categorical(k1, logits, shape=(batch_edges,))
        hk, tk = heads[e], tails[e]
        nk = jax.random.randint(k2, (batch_edges * neg_per_edge,), 0, n)
        l, g = jax.value_and_grad(loss_fn)(p, hk, tk, nk)
        upd, s = opt.update(g, s, p)
        p = optax.apply_updates(p, upd)
        return (p, s), l

    keys = jax.random.split(jax.random.fold_in(key, 1), steps)
    (params, _), losses = jax.lax.scan(step, (params, opt_state), keys)
    return params, _mlp(params, x), losses


class ParametricUMAP:
    """fit(x) learns the map; transform(y) embeds new points with it —
    aligned across datasets by construction (one shared map)."""

    def __init__(self, n_components: int = 2, k: int = 10,
                 steps: int = 1500, batch_edges: int = 256,
                 neg_per_edge: int = 4, hidden: Tuple[int, ...] = (128, 128),
                 lr: float = 1e-2, seed: int = 0):
        self.n_components = n_components
        self.k = k
        self.steps = steps
        self.batch_edges = batch_edges
        self.neg_per_edge = neg_per_edge
        self.hidden = tuple(hidden)
        self.lr = lr
        self.seed = seed
        self.params = None
        self._mu = self._sd = None

    def fit(self, x) -> np.ndarray:
        x = jnp.asarray(np.asarray(x, np.float32))
        if x.ndim != 2:
            raise ValueError(f"expected (N, D), got {x.shape}")
        # standardize so the MLP init scale is data-independent
        self._mu = x.mean(axis=0)
        self._sd = x.std(axis=0) + 1e-6
        xs = (x - self._mu) / self._sd
        k = min(self.k, x.shape[0] - 1)
        from .utils.prng import host_key
        self.params, emb, self.losses = _fit(
            xs, host_key(self.seed), k, self.steps,
            min(self.batch_edges, x.shape[0] * k), self.neg_per_edge,
            self.n_components, self.hidden, self.lr)
        return np.asarray(emb)

    def transform(self, y) -> np.ndarray:
        if self.params is None:
            raise RuntimeError("fit first")
        ys = (jnp.asarray(np.asarray(y, np.float32)) - self._mu) / self._sd
        return np.asarray(_mlp(self.params, ys))

    def fit_transform(self, x) -> np.ndarray:
        return self.fit(x)


def aligned_sweep_maps(sweeps: dict, **kwargs) -> dict:
    """Fit one parametric map on the union of all knob sweeps, then embed
    each sweep through it — the AlignedUMAP capability (reference
    effects_explorer.ipynb cells 57-134): corresponding clips stay
    comparable across sweeps because the map is shared.

    sweeps: {name: (n_points, D) array}. Returns ({name: (n_points, 2)},
    fitted ParametricUMAP).
    """
    names = list(sweeps)
    allx = np.concatenate([np.asarray(sweeps[n], np.float32).reshape(
        -1, np.asarray(sweeps[n]).shape[-1]) for n in names])
    pu = ParametricUMAP(**kwargs)
    pu.fit(allx)
    return {n: pu.transform(np.asarray(sweeps[n], np.float32).reshape(
        -1, np.asarray(sweeps[n]).shape[-1])) for n in names}, pu
