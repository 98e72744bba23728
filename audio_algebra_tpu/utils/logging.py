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
        if use_wandb and os.environ.get("WANDB_API_KEY"):
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
        from .audio_io import save_audio
        import numpy as np

        path = self.dir / f"{name}_{step:08d}.wav"
        save_audio(str(path), np.clip(np.asarray(audio), -1, 1), sample_rate)
        self.log({name: str(path)}, step=step)
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
