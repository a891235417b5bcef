"""Structured metric logging (JSONL) and optional jax.profiler tracing.

The reference's observability is tqdm postfixes (``train.py:32,42``); here
every training run writes machine-readable step metrics, and a profiler
trace can be captured around any step window.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Optional


class MetricLogger:
    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self.path = path
        self.echo = echo
        self.records: list = []  # in-memory copy of every logged record
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a")
        else:
            self._f = None

    def log(self, **metrics: Any):
        rec = {"time": time.time(), **metrics}
        self.records.append(rec)
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()
        if self.echo:
            parts = [
                f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in metrics.items()
            ]
            print("  ".join(parts), flush=True)

    def close(self):
        if self._f:
            self._f.close()


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace around a block (no-op if log_dir None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
