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


def point_cloud_html(points, colors=None, title: str = "PCA point cloud",
                     path=None):
    """Self-contained interactive 3-D point cloud (drag to rotate, scroll
    to zoom) as a single HTML string — the reference's interactive plotly
    scatter_3d role (reference mirage.py:434-444, effects_explorer.ipynb
    cell 192) without plotly, matching this repo's dependency-free
    serving GUI. `colors` is an optional scalar per point (mapped through
    a viridis-like ramp; defaults to point index). Writes to `path` when
    given; returns the HTML either way."""
    import json as _json

    pts = np.asarray(points, np.float32)
    if pts.ndim != 2 or pts.shape[1] < 3:
        raise ValueError(f"expected (N, >=3) points, got {pts.shape}")
    pts = pts[:, :3]
    # normalize into [-1, 1] so the JS camera needs no per-data tuning
    c = pts.mean(axis=0)
    scale = float(np.abs(pts - c).max() or 1.0)
    pts = (pts - c) / scale
    if colors is None:
        colors = np.arange(len(pts), dtype=np.float32)
    col = np.asarray(colors, np.float32).ravel()[: len(pts)]
    span = float(col.max() - col.min()) or 1.0
    col = (col - col.min()) / span
    data = _json.dumps(np.round(np.column_stack([pts, col]), 4).tolist())

    html = f"""<!doctype html><html><head><meta charset="utf-8">
<title>{title}</title><style>body{{margin:0;background:#111;color:#ddd;
font-family:system-ui}}#c{{display:block}}#t{{position:fixed;top:8px;
left:12px;font-size:14px}}</style></head><body>
<div id="t">{title} &mdash; drag to rotate, scroll to zoom</div>
<canvas id="c"></canvas><script>
const P={data};
const cv=document.getElementById('c'),ctx=cv.getContext('2d');
let rx=-0.5,ry=0.6,zoom=1,drag=null;
function viridis(t){{const s=[[68,1,84],[59,82,139],[33,145,140],
[94,201,98],[253,231,37]];const i=Math.min(3.999,t*4),k=i|0,f=i-k;
const a=s[k],b=s[k+1];return `rgb(${{a[0]+(b[0]-a[0])*f|0}},`+
`${{a[1]+(b[1]-a[1])*f|0}},${{a[2]+(b[2]-a[2])*f|0}})`}}
function draw(){{
 cv.width=innerWidth;cv.height=innerHeight;
 const w=cv.width,h=cv.height,s=Math.min(w,h)*0.36*zoom;
 ctx.fillStyle='#111';ctx.fillRect(0,0,w,h);
 const ca=Math.cos(ry),sa=Math.sin(ry),cb=Math.cos(rx),sb=Math.sin(rx);
 const q=P.map(p=>{{
  const x=p[0]*ca+p[2]*sa, z=-p[0]*sa+p[2]*ca;
  const y=p[1]*cb-z*sb, z2=p[1]*sb+z*cb;
  return [x,y,z2,p[3]];}}).sort((a,b)=>a[2]-b[2]);
 for(const [x,y,z,t] of q){{
  const d=1/(2.2-z);
  ctx.fillStyle=viridis(t);ctx.globalAlpha=0.85;
  ctx.beginPath();
  ctx.arc(w/2+x*s*d*2.2,h/2-y*s*d*2.2,Math.max(1.2,3.5*d),0,6.283);
  ctx.fill();}}
 ctx.globalAlpha=1;}}
addEventListener('resize',draw);
cv.onmousedown=e=>drag=[e.clientX,e.clientY];
onmouseup=()=>drag=null;
onmousemove=e=>{{if(drag){{ry+=(e.clientX-drag[0])*0.008;
 rx+=(e.clientY-drag[1])*0.008;drag=[e.clientX,e.clientY];draw();}}}};
cv.onwheel=e=>{{e.preventDefault();zoom*=e.deltaY<0?1.1:0.9;draw();}};
draw();
</script></body></html>"""
    if path is not None:
        with open(path, "w") as f:
            f.write(html)
    return html
