"""Pyramid -> region regrouping.

The reference precomputes host-side index tables mapping each of the 49
coarse 7x7 regions to its spatially-aligned finer tokens and gathers with
fancy indexing (/root/reference/models/model.py:106-211,
model_wo_extra_params.py:110-212). We build the same tables (numpy,
trace-time constants) and gather with jnp.take over the flattened spatial
axis — a static gather XLA turns into a cheap reshuffle.

Reproduced quirk Q8: the 14x14 stage's 2x2 blocks are enumerated
COLUMN-major ([tl, bl, tr, br], model.py:114-121) while the 28x28 and 56x56
blocks are row-major. The per-token-slot pos_embed_for_scale makes this
ordering observable, so checkpoint parity requires keeping it.

Token order per region: [stage3 (1 tok), stage2 (4), stage1 (16), stage0 (64)]
(coarsest first, model_wo_extra_params.py:264,281,294).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

# Map stage key -> (grid side, tokens per region)
STAGE_GRID = {"0": 56, "1": 28, "2": 14, "3": 7}
STAGE_TOKENS = {"0": 64, "1": 16, "2": 4, "3": 1}


@functools.lru_cache(maxsize=None)
def region_index(stage: str) -> np.ndarray:
    """[49, tokens_per_region] flattened-row-major positions into the
    stage's HxW grid, per the reference's formulas."""
    idx = np.empty((49, STAGE_TOKENS[stage]), dtype=np.int32)
    for r in range(7):
        for c in range(7):
            p = r * 7 + c
            if stage == "3":
                idx[p, :] = p
            elif stage == "2":
                # Q8: column-major 2x2 enumeration (model.py:114-121)
                idx[p, :] = [
                    2 * r * 14 + 2 * c,
                    (2 * r + 1) * 14 + 2 * c,
                    2 * r * 14 + (2 * c + 1),
                    (2 * r + 1) * 14 + (2 * c + 1),
                ]
            elif stage == "1":
                idx[p, :] = [
                    (4 * r + i) * 28 + 4 * c + j
                    for i in range(4) for j in range(4)
                ]
            elif stage == "0":
                idx[p, :] = [
                    (8 * r + i) * 56 + 8 * c + j
                    for i in range(8) for j in range(8)
                ]
            else:
                raise ValueError(f"unknown stage {stage}")
    return idx


def _regroup_stage(f: jnp.ndarray, stage: str) -> jnp.ndarray:
    """One stage's space-to-depth regroup as pure reshape/transpose.

    The reference's index tables are exactly a blocked space-to-depth
    permutation, so instead of a gather (whose BACKWARD is a scatter-add —
    measurably slow on TPU) we express it as layout ops; forward and
    backward are both plain transposed copies. Token order inside each
    region: row-major (i*n + j) for the 28/56 grids; Q8's column-major
    (j*2 + i) for the 14 grid (model.py:114-121)."""
    B, H, W, C = f.shape
    n = H // 7
    x = f.reshape(B, 7, n, 7, n, C)          # [B, r, i, c, j, C]
    if stage == "2":
        x = x.transpose(0, 1, 3, 4, 2, 5)    # Q8: (j, i) column-major
    else:
        x = x.transpose(0, 1, 3, 2, 4, 5)    # row-major (i, j)
    return x.reshape(B, 49, n * n, C)


def regroup(features: dict, stages) -> jnp.ndarray:
    """Regroup projected NHWC stage features into region-grouped tokens.

    features: {stage: [B, H, W, C]} (all with common C after projection).
    stages: iterable of stage keys, coarsest-first (e.g. ["3","2"] for the
    2-scale release config).
    Returns [B, 49, S, C] with S = sum of tokens per region over stages.
    """
    parts = []
    for s in stages:
        f = features[s]
        B, H, W, C = f.shape
        assert H == W == STAGE_GRID[s], (s, f.shape)
        parts.append(_regroup_stage(f, s))   # [B, 49, n, C]
    return jnp.concatenate(parts, axis=2)


def regroup_gather(features: dict, stages) -> jnp.ndarray:
    """Reference formulation: explicit index tables + jnp.take. Kept as
    the ground truth the layout-op path is tested against."""
    parts = []
    for s in stages:
        f = features[s]
        B, H, W, C = f.shape
        flat = f.reshape(B, H * W, C)
        idx = jnp.asarray(region_index(s))
        parts.append(jnp.take(flat, idx, axis=1))
    return jnp.concatenate(parts, axis=2)


def stages_for(num_layers: int):
    """Coarsest-first stage list for a scale count (model_wo_extra_params.py:252-294)."""
    return ["3", "2", "1", "0"][:num_layers]
