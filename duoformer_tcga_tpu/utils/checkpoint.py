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

    def save(self, step: int, state: Dict[str, Any], metrics=None):
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics)

    def restore(self, state_like: Dict[str, Any],
                step: Optional[int] = None) -> Optional[Dict[str, Any]]:
        """Restore latest (or given) step into the structure of
        `state_like`; returns None when no checkpoint exists."""
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_like))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


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
