"""Metrics logging: stdout + JSONL, with optional wandb when installed.

Replaces the reference's wandb/tensorboard wiring (src/train.py:204-213,
463,670-672) with a dependency-free default; wandb attaches automatically
when the package and WANDB_API_KEY are present."""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, output_dir: str, project: Optional[str] = None,
                 run_name: Optional[str] = None, use_wandb: bool = True):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.jsonl")
        self._fh = open(self.path, "a")
        self._t0 = time.time()
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # noqa

                self._wandb = wandb
                self._wandb.init(project=project or "tvi", name=run_name)
            except Exception:
                self._wandb = None

    def log(self, step: int, metrics: Dict[str, float]):
        rec = {"step": step, "time": round(time.time() - self._t0, 3),
               **{k: float(v) for k, v in metrics.items()}}
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self):
        self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()
