"""Parametric UMAP-style embedding (umap_param.py): kNN/fuzzy-graph
invariants, cluster-structure preservation, and the alignment property
the reference gets from AlignedUMAP (effects_explorer.ipynb cells 57-134).
"""
import numpy as np
import pytest

from audio_algebra_tpu.umap_param import (ParametricUMAP, knn_graph,
                                          aligned_sweep_maps)


def _three_clusters(n_per=30, d=16, seed=0):
    rng = np.random.default_rng(seed)
    centers = np.zeros((3, d))
    centers[0, 0] = 10.0
    centers[1, 1] = 10.0
    centers[2, 2] = 10.0
    x = np.concatenate([c + rng.standard_normal((n_per, d))
                        for c in centers]).astype(np.float32)
    labels = np.repeat(np.arange(3), n_per)
    return x, labels


def test_knn_graph_invariants():
    import jax.numpy as jnp
    x, _ = _three_clusters(10)
    idx, w = knn_graph(jnp.asarray(x), k=5)
    assert idx.shape == (30, 5) and w.shape == (30, 5)
    assert not (np.asarray(idx) == np.arange(30)[:, None]).any()  # no self
    w = np.asarray(w)
    assert (w > 0).all() and (w <= 1 + 1e-6).all()
    # nearest neighbor always gets weight 1 (d == rho)
    np.testing.assert_allclose(w[:, 0], 1.0, atol=1e-5)
    # smooth-k calibration: sum_j w_ij ~= log2(k)
    np.testing.assert_allclose(w.sum(1), np.log2(5), rtol=0.05)


def test_clusters_separate_in_2d():
    x, labels = _three_clusters()
    pu = ParametricUMAP(steps=400, seed=1)
    emb = pu.fit_transform(x)
    assert emb.shape == (90, 2) and np.isfinite(emb).all()
    # intra-cluster spread must be well below inter-cluster distance
    cents = np.stack([emb[labels == i].mean(0) for i in range(3)])
    intra = max(np.linalg.norm(emb[labels == i] - cents[i], axis=1).mean()
                for i in range(3))
    inter = min(np.linalg.norm(cents[i] - cents[j])
                for i in range(3) for j in range(i + 1, 3))
    assert inter > 2 * intra, (inter, intra)


@pytest.mark.slow
def test_alignment_across_sweeps():
    """Two 'knob sweeps' = the same points slightly perturbed; a shared
    parametric map must place corresponding points near each other (the
    AlignedUMAP property) and is exactly reproducible for equal inputs."""
    x, labels = _three_clusters()
    rng = np.random.default_rng(3)
    sweeps = {"a": x, "b": x + 0.05 * rng.standard_normal(x.shape)
              .astype(np.float32)}
    maps, pu = aligned_sweep_maps(sweeps, steps=400, seed=2)
    assert set(maps) == {"a", "b"}
    ea, eb = maps["a"], maps["b"]
    scale = np.linalg.norm(ea.max(0) - ea.min(0))
    drift = np.linalg.norm(ea - eb, axis=1).mean()
    assert drift < 0.1 * scale, (drift, scale)
    # determinism: transform is a pure function of the fitted params
    np.testing.assert_array_equal(pu.transform(x), pu.transform(x))


def test_transform_requires_fit():
    with pytest.raises(RuntimeError):
        ParametricUMAP().transform(np.zeros((4, 8)))
