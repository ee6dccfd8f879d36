"""Logging: file+stdout tee (reference utils.py:49-76) and a JSONL metrics
writer (replaces TensorBoard scalars; tools can tail or convert)."""
from __future__ import annotations

import json
import os
import time
from typing import Optional


class Logger:
    def __init__(self, output_name: str):
        dirname = os.path.dirname(output_name)
        if dirname:
            os.makedirs(dirname, exist_ok=True)
        self.log_file = open(output_name, "a")

    def write(self, msg):
        self.log_file.write(str(msg) + "\n")
        self.log_file.flush()
        print(msg)


class MetricsWriter:
    """Appends {'step': n, 'wall': t, **scalars} JSON lines."""

    def __init__(self, path: str):
        dirname = os.path.dirname(path)
        if dirname:
            os.makedirs(dirname, exist_ok=True)
        self._f = open(path, "a")
        self._t0 = time.time()

    def log(self, step: int, **scalars):
        rec = {"step": int(step), "wall": round(time.time() - self._t0, 3)}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()


def maybe_tensorboard(logdir: str) -> Optional[object]:
    """TensorBoard SummaryWriter when torch is importable (host-only)."""
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(logdir)
    except Exception:
        return None
