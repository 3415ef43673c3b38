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


# viridis-like anchors for dependency-free colormapping (PIL only)
_CMAP_ANCHORS = ((0.267, 0.005, 0.329), (0.283, 0.141, 0.458),
                 (0.254, 0.265, 0.530), (0.207, 0.372, 0.553),
                 (0.164, 0.471, 0.558), (0.128, 0.567, 0.551),
                 (0.135, 0.659, 0.518), (0.267, 0.749, 0.441),
                 (0.478, 0.821, 0.318), (0.741, 0.873, 0.150),
                 (0.993, 0.906, 0.144))


def colormap(values):
    """[..] floats in [0, 1] -> uint8 RGB [..., 3] via piecewise-linear
    interpolation over the anchor palette (no matplotlib needed)."""
    import numpy as np

    v = np.clip(np.asarray(values, np.float64), 0.0, 1.0)
    a = np.asarray(_CMAP_ANCHORS)
    pos = v * (len(a) - 1)
    lo = np.minimum(pos.astype(np.int64), len(a) - 2)
    frac = (pos - lo)[..., None]
    rgb = a[lo] * (1.0 - frac) + a[lo + 1] * frac
    return (rgb * 255.0 + 0.5).astype(np.uint8)


def save_heatmap_png(arr, path: str, min_side: int = 448,
                     normalize: bool = True) -> str:
    """Render a 2-D float array as a colormapped PNG (nearest-neighbor
    upscaled so the shorter side is >= min_side — heatmap cells stay
    crisp blocks). normalize=True rescales to the array's own [min, max]
    for display; raw values belong in the accompanying npz."""
    import numpy as np
    from PIL import Image

    a = np.asarray(arr, np.float64)
    if normalize:
        span = a.max() - a.min()
        a = (a - a.min()) / (span if span > 0 else 1.0)
    img = Image.fromarray(colormap(a))
    h, w = a.shape
    k = max(1, -(-min_side // min(h, w)))   # ceil division
    img = img.resize((w * k, h * k), Image.NEAREST)
    img.save(path)
    return path


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
