"""Device mesh + sharding utilities (the TPU-native replacement for the
reference's absent distributed path — SURVEY §5.8: the reference's only
distributed artifacts are a dead `is_distributed` flag, main_toy.py:63).

Design: a 2-axis ("data", "model") jax.sharding.Mesh. DuoFormer's
parallelism profile is data-parallel-dominant (params replicate at ~139M;
the batch axis and the B*49-region axis are embarrassingly parallel), so
the default mesh puts all devices on "data" and leaves "model" at 1, but
every API below is mesh-shaped so tensor-sharded layouts ride the same
code path. XLA inserts the gradient all-reduce over ICI from the sharding
annotations; there are no hand-written collectives in the train step.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
DCN_AXIS = "dcn"


def _slice_major(devices):
    """Order devices slice-major (stable within a slice) so DCN-crossing
    axes get contiguous ICI groups. Virtual/CPU devices carry no
    slice_index — they keep their given order."""
    idx = [getattr(d, "slice_index", None) for d in devices]
    if any(i is None for i in idx):
        return list(devices)
    return [d for _, d in sorted(zip(idx, devices), key=lambda t: t[0])]


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              devices: Optional[Sequence] = None,
              platform: Optional[str] = None,
              dcn_slices: int = 1) -> Mesh:
    """Build a ("data", "model") mesh — or ("dcn", "data", "model") when
    dcn_slices > 1 — over the available devices.

    With model_parallel=1 (default) this is pure DP over the ICI ring —
    the layout the v5e-8 north-star workload uses (BASELINE.json).

    dcn_slices > 1 is the multi-pod/multi-slice layout: the leading "dcn"
    axis spans slices (data-center network), while "data" and "model" stay
    inside a slice (ICI). Devices are ordered slice-major (real TPU
    `slice_index` when present) so the only DCN-crossing collective is the
    per-leaf gradient all-reduce over "dcn" — XLA decomposes it into an
    ICI reduce-scatter + DCN all-reduce + ICI all-gather. Model-parallel
    groups never cross a slice boundary.

    platform: optional backend name ("cpu"/"tpu") to pick devices from a
    specific backend (needed because this environment's TPU plugin ignores
    JAX_PLATFORMS). Raises if fewer devices exist than requested — a mesh
    must never silently shrink."""
    if devices is None:
        devices = jax.devices(platform) if platform else jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} "
                f"available ({[d.platform for d in devices[:3]]}...)")
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    if dcn_slices > 1:
        if n % (dcn_slices * model_parallel):
            raise ValueError(
                f"{n} devices not divisible by dcn_slices={dcn_slices} "
                f"x model_parallel={model_parallel}")
        arr = np.asarray(_slice_major(devices)).reshape(
            dcn_slices, n // (dcn_slices * model_parallel), model_parallel)
        return Mesh(arr, (DCN_AXIS, DATA_AXIS, MODEL_AXIS))
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_axes(mesh: Mesh):
    """The mesh axes the batch dim is sharded over (dcn-first if present)."""
    if DCN_AXIS in mesh.axis_names:
        return (DCN_AXIS, DATA_AXIS)
    return DATA_AXIS


def data_parallel_size(mesh: Mesh) -> int:
    """Number of ways the batch dim is sharded (product over batch_axes)."""
    axes = batch_axes(mesh)
    size = 1
    for ax in ((axes,) if isinstance(axes, str) else axes):
        size *= mesh.shape[ax]
    return size


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim across the data (and dcn) axes."""
    return NamedSharding(mesh, P(batch_axes(mesh)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Host array(s) -> device-sharded along batch. Works on pytrees."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
