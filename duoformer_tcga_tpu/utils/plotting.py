"""Training-curve rendering from MetricLogger JSONL runs.

Capability twin of the reference's inline matplotlib accuracy plot
(main_toy.py:151-191), decoupled from the train loop: read the JSONL
metrics file, plot train/eval accuracy with the best-eval annotation.
Falls back to an ASCII sparkline when matplotlib is unavailable.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional


def read_metrics(path: str) -> List[Dict]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def plot_accuracy(metrics_path: str, out_path: Optional[str] = None,
                  train_key: str = "accuracy", eval_key: str = "eval_accuracy"):
    """Render accuracy curves; returns the output path or the ASCII plot."""
    recs = read_metrics(metrics_path)
    steps = [r["step"] for r in recs if train_key in r]
    train = [r[train_key] for r in recs if train_key in r]
    esteps = [r["step"] for r in recs if eval_key in r]
    evals = [r[eval_key] for r in recs if eval_key in r]

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return _ascii(steps, train, esteps, evals)

    fig, ax = plt.subplots()
    ax.plot(steps, train, label="train accuracy", marker="o", markersize=3)
    if evals:
        ax.plot(esteps, evals, label="eval accuracy", marker="x")
        best_i = max(range(len(evals)), key=lambda i: evals[i])
        ax.annotate(f"best eval: {evals[best_i]:.2%}",
                    xy=(esteps[best_i], evals[best_i]),
                    xytext=(0, 12), textcoords="offset points",
                    arrowprops=dict(arrowstyle="->"))
    ax.set_xlabel("step")
    ax.set_ylabel("accuracy")
    ax.legend()
    out_path = out_path or metrics_path.replace(".jsonl", "_accuracy.png")
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


def _ascii(steps, train, esteps, evals, width: int = 60) -> str:
    if not train:
        return "(no accuracy records)"
    blocks = " ▁▂▃▄▅▆▇█"
    def spark(vals):
        return "".join(blocks[int(min(max(v, 0), 1) * (len(blocks) - 1))]
                       for v in vals[-width:])
    out = [f"train acc  {spark(train)}  last={train[-1]:.3f}"]
    if evals:
        out.append(f"eval  acc  {spark(evals)}  best={max(evals):.3f}")
    return "\n".join(out)
