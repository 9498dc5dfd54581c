"""Structured metrics logging.

The reference logs by printing unlabeled floats (``image_scms/mnist.py:249``)
and scattering PNG/CSV artifacts. Here: one JSONL metrics stream per run
(readable by pandas / plotted by anything), plus stdout echo.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self.path = path
        self.echo = echo
        self._t0 = time.time()
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a")
        else:
            self._f = None

    def log(self, step: int, metrics: Dict[str, float], **extra) -> None:
        record = {
            "step": int(step),
            "time": round(time.time() - self._t0, 3),
            **{k: float(v) for k, v in metrics.items()},
            **extra,
        }
        if self._f:
            self._f.write(json.dumps(record) + "\n")
            self._f.flush()
        if self.echo:
            body = " ".join(f"{k}={v:.4f}" for k, v in metrics.items())
            print(f"[step {step}] {body}")

    def close(self):
        if self._f:
            self._f.close()
