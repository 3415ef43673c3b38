"""Pipeline parallelism (GPipe) over the scale-block stack.

The reference has no distributed path at all (SURVEY §2: its only
distributed artifacts are a dead `is_distributed` flag, main_toy.py:63);
DP and TP are implemented in parallel/mesh.py and parallel/tp*.py. This
module adds the third mesh axis: PIPELINE parallelism over the depth
dimension of the dominant compute — the 12 ScaleBlocks
(/root/reference/models/scale_attention.py:269-285), which are a
homogeneous stack of identical blocks with parameters already stored as
one [depth, ...] pytree (models/transformer.py stack_init). That layout
makes the TPU-native pipeline almost free to express:

  * the "pipe" mesh axis shards the stacked params along depth — stage s
    owns the contiguous blocks [s*L, (s+1)*L), L = depth / P;
  * activations move stage-to-stage with ONE `lax.ppermute` per tick
    (neighbor ICI traffic only — the cheapest collective on a TPU ring);
  * the GPipe schedule (M microbatches, T = M + P - 1 ticks, the classic
    (P-1)/M bubble) is a `lax.scan` over ticks INSIDE `jax.shard_map`,
    so XLA compiles one tick body;
  * everything is differentiable (scan + ppermute + where have exact
    transposes), so `jax.grad` through the pipeline IS pipelined
    backward — no hand-written backward schedule.

When to use: NOT for the flagship config on one chip (139M params fit
everywhere; DP is strictly better). PP is for the regimes where the
stacked blocks dominate memory/compute per device: 4-scale (86
tokens/region) at depth >> 12, embed_dim scaled up, or small-host
devices — and it composes with DP on a ("data", "pipe") mesh.

Numerics: microbatches are contiguous batch chunks run through identical
per-block math, so the pipelined forward is exactly the unpipelined
forward (per-sample ops; verified bit-level in tests/test_pp.py).
Dropout draws fold the microbatch index into each block key, so train
streams differ from the single-stream path (documented; any microbatch
split changes dropout geometry).
"""

from __future__ import annotations

import contextlib
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

PIPE_AXIS = "pipe"


def make_pp_mesh(n_devices: Optional[int] = None, pipeline_parallel: int = 2,
                 devices: Optional[Sequence] = None,
                 platform: Optional[str] = None) -> Mesh:
    """A ("data", "pipe") mesh: batch sharded over "data", the block stack
    sharded over "pipe". The pipe axis is minor-most so pipeline neighbors
    are ICI-adjacent on a real ring."""
    if devices is None:
        devices = jax.devices(platform) if platform else jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} "
                f"available")
        devices = devices[:n_devices]
    n = len(devices)
    if n % pipeline_parallel:
        raise ValueError(f"{n} devices not divisible by "
                         f"pipeline_parallel={pipeline_parallel}")
    arr = np.asarray(devices).reshape(n // pipeline_parallel,
                                      pipeline_parallel)
    return Mesh(arr, (DATA_AXIS, PIPE_AXIS))


def shard_params_pp(mesh: Mesh, params):
    """Place a model param tree for the pipeline: every leaf under a
    "scale_blocks" path key is sharded along its leading (depth) axis over
    "pipe"; everything else (backbone, projections, patch blocks, head)
    replicates. Leaves whose depth does not divide the pipe axis raise —
    a pipeline must never silently mis-shard."""
    pp = mesh.shape[PIPE_AXIS]
    stacked = NamedSharding(mesh, P(PIPE_AXIS))
    repl = NamedSharding(mesh, P())

    def place(path, leaf):
        in_stack = any(getattr(k, "key", None) == "scale_blocks"
                       for k in path)
        if in_stack:
            if leaf.shape[0] % pp:
                raise ValueError(
                    f"scale_blocks depth {leaf.shape[0]} not divisible by "
                    f"pipe={pp} at {jax.tree_util.keystr(path)}")
            return jax.device_put(leaf, stacked)
        return jax.device_put(leaf, repl)

    return jax.tree_util.tree_map_with_path(place, params)


def pipeline_stack_apply(mesh: Mesh, stacked, x, block_apply, *,
                         microbatches: Optional[int] = None, rng=None,
                         train: bool = False, remat: bool = False,
                         unroll: Optional[bool] = None):
    """Run x through the depth-stacked blocks, pipelined over the mesh's
    "pipe" axis with a GPipe microbatch schedule.

    stacked: [depth, ...] block-param pytree (depth % pipe == 0; stage s
      owns the contiguous slice [s*L, (s+1)*L)).
    x: [B, ...] activations; B must divide by dp * microbatches.
    block_apply(block, x, rng=r) -> x — the same body _scan_blocks uses
      (e.g. functools.partial(scale_block_apply, num_heads=...)).
    microbatches: GPipe M (default: the pipe size — the minimum that
      keeps every stage busy in steady state; raise it to shrink the
      (P-1)/M bubble at the cost of smaller per-tick GEMMs).
    unroll: unroll the tick scan into straight-line code. Default: auto —
      on on CPU meshes (XLA:CPU collectives inside a WhileThunk can
      deadlock on low-core hosts — same hazard __graft_entry__ documents
      for the dryrun), off on TPU (a real loop compiles faster at big T).

    Schedule: T = M + P - 1 ticks. At tick t, stage s runs microbatch
    (t - s) through its L local blocks (an inner lax.scan), then hands the
    result to stage s+1 via ppermute. Stage 0 injects microbatch t while
    t < M (re-running the last microbatch in the drain ticks — classic
    bubble waste, never collected); the last stage collects microbatch
    t - (P-1) from tick P-1 on. Grad flows through the exact transposes
    of scan/ppermute/select, so jax.grad of a loss through this function
    is the pipelined backward."""
    if PIPE_AXIS not in mesh.axis_names or DATA_AXIS not in mesh.axis_names:
        raise ValueError(f"pipeline mesh needs ('{DATA_AXIS}', "
                         f"'{PIPE_AXIS}') axes, got {mesh.axis_names}")
    pp = mesh.shape[PIPE_AXIS]
    dp = mesh.shape[DATA_AXIS]
    depth = int(jax.tree.leaves(stacked)[0].shape[0])
    if depth % pp:
        raise ValueError(f"depth {depth} not divisible by pipe={pp}")
    M = int(microbatches) if microbatches else pp
    B = x.shape[0]
    if B % (dp * M):
        raise ValueError(f"batch {B} not divisible by data={dp} x "
                         f"microbatches={M}")
    if unroll is None:
        unroll = mesh.devices.flat[0].platform == "cpu"
    use_rng = train and rng is not None
    if use_rng:
        rngs = jax.random.split(rng, depth)
    else:
        rngs = jnp.zeros((depth, 2), jnp.uint32)

    if pp == 1:                       # degenerate mesh: plain scan
        def body(carry, sc):
            blk, r = sc
            return block_apply(blk, carry,
                               rng=(r if use_rng else None)), None
        if remat:
            body = jax.checkpoint(body)
        out, _ = lax.scan(body, x, (stacked, rngs))
        return out

    T = M + pp - 1

    def stage_fn(blocks, lrngs, xb):
        """Per-device body. blocks: [L, ...] local slice; lrngs: [L, 2];
        xb: [B_local, ...] this data-shard's batch."""
        stage = lax.axis_index(PIPE_AXIS)
        mb = xb.shape[0] // M
        xs = xb.reshape(M, mb, *xb.shape[1:])

        def run_local(cur, m):
            def body(carry, sc):
                blk, r = sc
                rr = jax.random.fold_in(r, m) if use_rng else None
                return block_apply(blk, carry, rng=rr), None
            if remat:
                body = jax.checkpoint(body)
            out, _ = lax.scan(body, cur, (blocks, lrngs))
            return out

        def tick(carry, t):
            buf, out = carry
            inj = lax.dynamic_index_in_dim(xs, jnp.clip(t, 0, M - 1), 0,
                                           keepdims=False)
            cur = jnp.where(stage == 0, inj, buf)
            m = jnp.clip(t - stage, 0, M - 1)  # microbatch id at this stage
            y = run_local(cur, m)
            m_out = t - (pp - 1)               # microbatch finishing now
            upd = lax.dynamic_update_index_in_dim(
                out, y, jnp.clip(m_out, 0, M - 1), 0)
            out = jnp.where((stage == pp - 1) & (m_out >= 0), upd, out)
            nbuf = lax.ppermute(y, PIPE_AXIS,
                                [(i, i + 1) for i in range(pp - 1)])
            return (nbuf, out), None

        # the carries become device-varying over "pipe" after the first
        # tick (axis_index selects + ppermute); mark the zero inits so
        # the scan carry type is tick-invariant (shard_map vma typing)
        buf0 = lax.pcast(jnp.zeros_like(xs[0]), (PIPE_AXIS,), to="varying")
        out0 = lax.pcast(jnp.zeros_like(xs), (PIPE_AXIS,), to="varying")
        (_, out), _ = lax.scan(tick, (buf0, out0), jnp.arange(T),
                               unroll=T if unroll else 1)
        # only the last stage holds the result; replicate it over "pipe"
        out = lax.psum(jnp.where(stage == pp - 1, out,
                                 jnp.zeros_like(out)), PIPE_AXIS)
        return out.reshape(xb.shape)

    stack_specs = jax.tree.map(lambda _: P(PIPE_AXIS), stacked)
    return jax.shard_map(
        stage_fn, mesh=mesh,
        in_specs=(stack_specs, P(PIPE_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
    )(stacked, rngs, x)


# -- model-level engagement ----------------------------------------------------

# Trace-time pipeline context, mirroring ops/attention._TP_MESH: when set,
# MultiscaleFormer.apply routes its scale stack through
# pipeline_stack_apply instead of _scan_blocks.
_PP_CTX = None


@contextlib.contextmanager
def pipeline_context(mesh: Mesh, microbatches: Optional[int] = None,
                     unroll: Optional[bool] = None):
    """Route the scale stack of any MultiscaleFormer traced inside this
    block through the GPipe pipeline over `mesh`'s "pipe" axis."""
    global _PP_CTX
    prev = _PP_CTX
    _PP_CTX = (mesh, microbatches, unroll)
    try:
        yield
    finally:
        _PP_CTX = prev
