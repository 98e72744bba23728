"""Experiment logging: wandb when available, JSONL always.

The reference logs per-step scalar dicts + rich media to wandb throughout
(reference aa_mixer.py:420-428, train_aa_effects.py:144-175). This logger
keeps that call surface (`log(dict)`, `log_audio`, `push_config`) but writes
a local JSONL run log unconditionally and forwards to wandb only when the
package + credentials exist — so training runs headless in this environment.
"""
from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Optional


class RunLogger:
    def __init__(self, project: str, name: Optional[str] = None,
                 out_dir: str = "runs", use_wandb: bool = True, config: Optional[dict] = None):
        self.project = project
        self.name = name or time.strftime("%Y%m%d-%H%M%S")
        self.dir = Path(out_dir) / project / self.name
        self.dir.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.dir / "log.jsonl", "a")
        self._step = 0
        self.wandb = None
        if use_wandb and (os.environ.get("WANDB_API_KEY")
                          or os.environ.get("WANDB_MODE")):
            try:
                import wandb
                self.wandb = wandb.init(project=project, name=name, config=config)
            except Exception as e:
                print(f"RunLogger: wandb unavailable ({e}); JSONL only")
        if config:
            with open(self.dir / "config.json", "w") as f:
                json.dump(config, f, indent=2, default=str)

    def log(self, metrics: dict, step: Optional[int] = None):
        step = self._step if step is None else step
        rec = {"step": step, "ts": time.time()}
        rec.update({k: (float(v) if hasattr(v, "item") or isinstance(v, (int, float)) else v)
                    for k, v in metrics.items()})
        self._fh.write(json.dumps(rec, default=str) + "\n")
        self._fh.flush()
        if self.wandb is not None:
            self.wandb.log(metrics, step=step)
        self._step = step + 1

    def log_audio(self, name: str, audio, sample_rate: int, step: int = 0):
        """Save a wav locally; forward as wandb.Audio when active
        (reference DemoCallback wandb.Audio, train_aa_effects.py:160)."""
        from .audio_io import save_audio
        import numpy as np

        path = self.dir / f"{name.replace('/', '_')}_{step:08d}.wav"
        save_audio(str(path), np.clip(np.asarray(audio), -1, 1), sample_rate)
        payload = str(path)
        if self.wandb is not None:
            import wandb
            payload = wandb.Audio(str(path), sample_rate=sample_rate)
        self.log({name: payload}, step=step)
        return str(path)

    def log_image(self, name: str, image, step: int = 0):
        """image: (H, W[, C]) array or an image file path; forwarded as
        wandb.Image when active (reference token-spectrogram images,
        train_aa_effects.py:150-158)."""
        path = image if isinstance(image, str) else None
        if path is None:
            import numpy as np
            from .viz import save_image
            path = save_image(
                np.asarray(image),
                str(self.dir / f"{name.replace('/', '_')}_{step:08d}.png"))
        payload = path
        if self.wandb is not None and path is not None:
            import wandb
            payload = wandb.Image(path)
        self.log({name: payload}, step=step)
        return path

    def log_table(self, name: str, columns, rows, step: int = 0):
        """Tabular demo data; wandb.Table when active (reference
        embeddings_table, train_aa_effects.py:144-149); CSV always."""
        import csv

        path = self.dir / f"{name.replace('/', '_')}_{step:08d}.csv"
        with open(path, "w", newline="") as f:
            wr = csv.writer(f)
            wr.writerow(columns)
            wr.writerows(rows)
        payload = str(path)
        if self.wandb is not None:
            import wandb
            payload = wandb.Table(columns=list(columns),
                                  data=[list(r) for r in rows])
        self.log({name: payload}, step=step)
        return str(path)

    def log_point_cloud(self, name: str, points, step: int = 0):
        """(N, 3..6) point cloud; wandb.Object3D when active (reference
        pca_point_cloud, train_aa_effects.py:151)."""
        import numpy as np

        pts = np.asarray(points)
        path = self.dir / f"{name.replace('/', '_')}_{step:08d}.npy"
        np.save(path, pts)
        if pts.ndim == 2 and pts.shape[1] >= 3:
            # interactive twin of the npy (reference logs plotly 3-D
            # clouds to wandb, train_aa_effects.py:151) — no deps
            from .viz import point_cloud_html
            point_cloud_html(pts, title=name,
                             path=str(path.with_suffix(".html")))
        payload = str(path)
        if self.wandb is not None:
            import wandb
            payload = wandb.Object3D(pts)
        self.log({name: payload}, step=step)
        return str(path)

    def push_config(self, args):
        cfg = args.to_dict() if hasattr(args, "to_dict") else vars(args)
        with open(self.dir / "config.json", "w") as f:
            json.dump(cfg, f, indent=2, default=str)
        if self.wandb is not None:
            self.wandb.config.update(cfg)

    def finish(self):
        self._fh.close()
        if self.wandb is not None:
            self.wandb.finish()
