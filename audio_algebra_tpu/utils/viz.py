"""Visualization data utilities (aeiou.viz capability).

The reference logs embeddings tables, 3-D PCA point clouds, and token/audio
spectrogram images to wandb (aeiou.viz usage at reference
train_aa_effects.py:144-175, mirage.py:434-444, Destructo cells). These
rebuilds return *data* (arrays/dicts) so they work headless; PNG rendering
uses matplotlib when present.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def embeddings_table(zs: Sequence, names: Optional[Sequence[str]] = None) -> dict:
    """Summary stats per embedding tensor (stand-in for the wandb table at
    reference train_aa_effects.py:144)."""
    names = names or [f"z{i}" for i in range(len(zs))]
    out = {}
    for name, z in zip(names, zs):
        z = np.asarray(z)
        out[name] = {"shape": list(z.shape), "mean": float(z.mean()),
                     "std": float(z.std()), "min": float(z.min()),
                     "max": float(z.max())}
    return out


def pca_point_cloud(z, n_components: int = 3, mean_axis: Optional[int] = -1) -> np.ndarray:
    """Project embeddings (b, d, n) to a (points, n_components) PCA cloud
    (aeiou.pca_point_cloud capability; reference train_aa_effects.py:152).

    mean_axis=-1 time-averages first (the effects_explorer recipe); None
    treats every (b, n) position as a point.
    """
    z = np.asarray(z, np.float64)
    if z.ndim == 3:
        pts = z.mean(axis=mean_axis) if mean_axis is not None \
            else np.moveaxis(z, 1, 2).reshape(-1, z.shape[1])
    else:
        pts = z.reshape(-1, z.shape[-1])
    pts = pts - pts.mean(axis=0)
    # SVD-based PCA (no sklearn); zero-pad when rank < n_components
    _, _, vt = np.linalg.svd(pts, full_matrices=False)
    proj = (pts @ vt[:n_components].T).astype(np.float32)
    if proj.shape[1] < n_components:
        proj = np.pad(proj, [(0, 0), (0, n_components - proj.shape[1])])
    return proj


def spectrogram_db(audio, sr: int = 48000, n_fft: int = 1024, hop: int = 256,
                   top_db: float = 80.0) -> np.ndarray:
    """Audio -> dB magnitude spectrogram array (image data for
    audio_spectrogram_image / playable_spectrogram capability)."""
    import jax.numpy as jnp
    from ..ops.stft import spectrogram

    x = np.asarray(audio, np.float32)
    if x.ndim == 1:
        x = x[None]
    mag = np.asarray(jnp.abs(spectrogram(jnp.asarray(x), n_fft, hop, power=1.0)))
    mag = mag.mean(axis=0) if mag.ndim == 3 else mag
    db = 20.0 * np.log10(np.maximum(mag, 1e-10))
    return np.clip(db, db.max() - top_db, None)[::-1]    # low freqs at bottom


def tokens_spectrogram_image(embeddings) -> np.ndarray:
    """Embeddings (b, d, n) -> concatenated (d, b*n) image array
    (aeiou.tokens_spectrogram_image capability)."""
    z = np.asarray(embeddings)
    if z.ndim == 3:
        z = np.concatenate([z[i] for i in range(z.shape[0])], axis=-1)
    return z


def save_image(array: np.ndarray, path: str, cmap: str = "magma") -> Optional[str]:
    """Render a 2-D array to PNG via matplotlib when available."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 4))
        ax.imshow(array, aspect="auto", origin="lower", cmap=cmap)
        ax.set_xticks([]), ax.set_yticks([])
        fig.tight_layout()
        fig.savefig(path, dpi=100)
        plt.close(fig)
        return path
    except Exception:
        np.save(path + ".npy", array)
        return None
