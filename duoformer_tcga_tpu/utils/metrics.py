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


def roc_auc_ovr(probs, labels, num_classes: int) -> float:
    """Macro one-vs-rest ROC-AUC from [N, C] class probabilities.

    Rank (Mann-Whitney U) formulation with average ranks for ties —
    dependency-free equivalent of sklearn's roc_auc_score(multi_class=
    "ovr", average="macro"). Classes with no positives or no negatives in
    `labels` are skipped; returns nan when no class is scoreable.
    Binary (num_classes=2) reduces to the standard ROC-AUC."""
    import numpy as np

    probs = np.asarray(probs, np.float64)
    labels = np.asarray(labels)
    aucs = []
    for c in range(num_classes):
        pos = labels == c
        n1 = int(pos.sum())
        n0 = len(labels) - n1
        if n1 == 0 or n0 == 0:
            continue
        s = probs[:, c]
        _, inv, counts = np.unique(s, return_inverse=True,
                                   return_counts=True)
        # 1-based average rank of each tie group
        avg_rank = np.cumsum(counts) - (counts - 1) / 2.0
        ranks = avg_rank[inv]
        aucs.append((ranks[pos].sum() - n1 * (n1 + 1) / 2.0) / (n1 * n0))
    return float(np.mean(aucs)) if aucs else float("nan")


def fit_temperature(log_probs, labels, iters: int = 80) -> float:
    """Temperature scaling (Guo et al. 2017): the single scalar T > 0
    minimizing NLL of softmax(z / T) on a held-out set. Works on
    LOG-PROBABILITIES as well as raw logits: log_softmax differs from
    the logits by a per-row constant, and a per-row constant divided by
    T is still per-row — the softmax is identical either way (so
    make_eval_full_step's probs feed this via np.log).

    Golden-section search on log T in [-3, 3]; NLL(T) is smooth and
    unimodal in practice. Returns T (1.0 means already calibrated)."""
    import numpy as np

    z = np.asarray(log_probs, np.float64)
    labels = np.asarray(labels, np.int64)

    def nll(t):
        zt = z / t
        zt = zt - zt.max(-1, keepdims=True)
        logp = zt - np.log(np.exp(zt).sum(-1, keepdims=True))
        return -logp[np.arange(len(labels)), labels].mean()

    phi = (5 ** 0.5 - 1) / 2
    a, b = -3.0, 3.0
    for _ in range(iters):
        c, d = b - phi * (b - a), a + phi * (b - a)
        if nll(np.exp(c)) < nll(np.exp(d)):
            b = d
        else:
            a = c
    return float(np.exp((a + b) / 2))


def nll_of(probs, labels) -> float:
    """Mean negative log-likelihood of [N, C] probabilities."""
    import numpy as np

    p = np.asarray(probs, np.float64)
    labels = np.asarray(labels, np.int64)
    return float(-np.log(np.maximum(
        p[np.arange(len(labels)), labels], 1e-12)).mean())


def expected_calibration_error(probs, labels, bins: int = 15) -> float:
    """ECE: confidence-binned |accuracy - confidence| weighted by bin
    mass (the standard top-label calibration metric)."""
    import numpy as np

    p = np.asarray(probs, np.float64)
    labels = np.asarray(labels, np.int64)
    conf = p.max(-1)
    correct = (p.argmax(-1) == labels).astype(np.float64)
    edges = np.linspace(0.0, 1.0, bins + 1)
    ece = 0.0
    for i in range(bins):
        m = (conf > edges[i]) & (conf <= edges[i + 1])
        if m.any():
            ece += m.mean() * abs(correct[m].mean() - conf[m].mean())
    return float(ece)


def macro_f1(preds, labels, num_classes: int) -> float:
    """Macro-averaged F1 over classes present in `labels` or `preds`
    (classes absent from both are skipped, not counted as 0)."""
    import numpy as np

    preds = np.asarray(preds)
    labels = np.asarray(labels)
    f1s = []
    for c in range(num_classes):
        tp = int(((preds == c) & (labels == c)).sum())
        fp = int(((preds == c) & (labels != c)).sum())
        fn = int(((preds != c) & (labels == c)).sum())
        if tp + fp + fn == 0:
            continue
        f1s.append(2.0 * tp / (2.0 * tp + fp + fn))
    return float(np.mean(f1s)) if f1s else float("nan")
