"""Structured per-step metrics & throughput meters (SURVEY §5.5).

The reference logs via print() at epoch granularity (main_toy.py:125-133).
Here: device-computed metrics fetched asynchronously, a step timer with
EMA, and a JSONL writer for machine-readable run logs.
"""

from __future__ import annotations

import json
import time
from typing import Dict, Optional


class StepTimer:
    """Wall-clock step timer with warmup skip and EMA."""

    def __init__(self, ema: float = 0.9, skip: int = 2):
        self.ema = ema
        self.skip = skip
        self._count = 0
        self._last = None
        self.avg_s: Optional[float] = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self._count += 1
            if self._count > self.skip:
                self.avg_s = dt if self.avg_s is None else (
                    self.ema * self.avg_s + (1 - self.ema) * dt)
        self._last = now

    def tiles_per_sec(self, batch_size: int) -> Optional[float]:
        return batch_size / self.avg_s if self.avg_s else None


class MetricLogger:
    """JSONL metrics sink + console echo."""

    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self._f = open(path, "a") if path else None
        self.echo = echo

    def log(self, step: int, metrics: Dict, **extra):
        rec = {"step": int(step)}
        for k, v in {**metrics, **extra}.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()
        if self.echo:
            body = " ".join(f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
                            for k, v in rec.items() if k != "step")
            print(f"[step {rec['step']}] {body}", flush=True)

    def close(self):
        if self._f:
            self._f.close()
