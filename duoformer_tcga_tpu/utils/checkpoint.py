"""Checkpoint save/restore (orbax) + deterministic resume.

Replaces the reference's save-only whole-object pickling
(/root/reference/main_toy.py:135-149, quirk Q14 — its checkpoints can't be
loaded without the original class definitions) with proper state-tree
checkpoints: params, optimizer state, step, and RNG key, written
asynchronously and pruned to the newest K.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True, enable_async_checkpointing=True),
        )
        self._best: Optional[ocp.CheckpointManager] = None

    def _best_dir(self) -> str:
        return os.path.join(self.directory, "best")

    def _best_mgr(self, create: bool) -> Optional[ocp.CheckpointManager]:
        """The companion best-metric manager (<dir>/best, max_to_keep=1).

        Separate from the rolling resume checkpoints on purpose: orbax's
        max_to_keep prunes by RECENCY regardless of the metrics= passed to
        save() (best_fn ordering would also reorder the resume saves), so
        a best checkpoint held in the main manager would be deleted by the
        next `keep` periodic saves."""
        if self._best is None and (create or os.path.isdir(self._best_dir())):
            self._best = ocp.CheckpointManager(
                self._best_dir(),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=1, create=True,
                    enable_async_checkpointing=True),
            )
        return self._best

    def save(self, step: int, state: Dict[str, Any], metrics=None):
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics)

    def save_best(self, step: int, state: Dict[str, Any], metrics=None):
        """Save into <dir>/best (kept forever — never pruned by the
        rolling resume saves). Caller decides what 'best' means; the
        metrics dict is persisted in a JSON sidecar so a RESUMED run can
        recover the bar to beat (best_metrics)."""
        self._best_mgr(create=True).save(
            step, args=ocp.args.StandardSave(state), metrics=metrics)
        if metrics is not None:
            import json
            with open(os.path.join(self._best_dir(),
                                   "best_metrics.json"), "w") as f:
                json.dump(dict(metrics, step=step), f)

    def best_metrics(self) -> Optional[Dict[str, Any]]:
        """The metrics recorded with the newest save_best; None if no
        best checkpoint (or an older layout without the sidecar)."""
        try:
            import json
            with open(os.path.join(self._best_dir(),
                                   "best_metrics.json")) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None

    def restore(self, state_like: Dict[str, Any],
                step: Optional[int] = None) -> Optional[Dict[str, Any]]:
        """Restore latest (or given) step into the structure of
        `state_like`; returns None when no checkpoint exists."""
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_like))

    def restore_best(self, state_like: Dict[str, Any]
                     ) -> Optional[Dict[str, Any]]:
        """Restore the best-metric checkpoint; None when none was saved."""
        mgr = self._best_mgr(create=False)
        if mgr is None:
            return None
        step = mgr.latest_step()
        if step is None:
            return None
        return mgr.restore(step, args=ocp.args.StandardRestore(state_like))

    def best_step(self) -> Optional[int]:
        mgr = self._best_mgr(create=False)
        return None if mgr is None else mgr.latest_step()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()
        if self._best is not None:
            self._best.wait_until_finished()

    def close(self):
        self._mgr.close()
        if self._best is not None:
            self._best.close()


def save_params_npz(path: str, params) -> None:
    """Dependency-free flat export (interchange/debugging)."""
    import numpy as np

    flat = {}

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}{k}/")
        elif isinstance(tree, (list, tuple)):
            for i, v in enumerate(tree):
                walk(v, f"{prefix}{i}/")
        else:
            flat[prefix[:-1]] = np.asarray(tree)

    walk(params)
    np.savez(path, **flat)


def load_params_npz_flat(path: str):
    """Template-free inverse of save_params_npz: rebuild the nested tree
    from the flat slash-joined keys, as nested DICTS throughout (framework
    param trees are nested dicts — digit keys like the resnet block
    indices are dict keys, not list indices). Needed for serving artifacts
    whose structure differs from model.init's (e.g. int8-quantized trees
    with w_q/scale leaves)."""
    import numpy as np

    import jax.numpy as jnp

    data = np.load(path)
    tree: dict = {}
    for key in data.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])
    return tree


def load_params_npz(path: str, params_like):
    """Inverse of save_params_npz given a structure template."""
    import numpy as np

    import jax.numpy as jnp

    data = np.load(path)

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: walk(v, f"{prefix}{k}/") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return [walk(v, f"{prefix}{i}/") for i, v in enumerate(tree)]
        return jnp.asarray(data[prefix[:-1]])

    return walk(params_like)
