"""Tensor-parallel execution of the fused Pallas megakernels via shard_map.

Round 1 forced the XLA attention path whenever the mesh had a model axis
(pallas_call does not partition over sharded operands). This module keeps
the fused kernels under TP by dropping to per-device code with
jax.shard_map over the model axis — the Megatron split done the TPU way:

  * each model-shard runs the SAME megakernel on its own contiguous slice
    of attention heads (column-parallel qkv, row-parallel proj) or MLP
    hidden units (column-parallel fc1, row-parallel fc2);
  * partial branch outputs are psum-ed over the model axis (ONE f32
    all-reduce per branch — exactly the collective Megatron-LM issues);
  * LayerNorm is recomputed per shard (replicated math, zero comms) and
    the residual/bias are added once, after the psum.

Weight layouts: the framework stores qkv as [C, 3C] in (3, H, D) column
order (torch/timm layout, required for checkpoint parity). A contiguous
model-axis chunk of that layout mixes q/k/v columns, so the qkv weight is
taken replicated (jit all-gathers the TP-sharded param — [C,3C] bf16 is
~3.4MB/block, ~0.2ms on ICI) and each shard dynamic-slices its heads.
proj [C, C] (row-sharded), fc1 [C, 4C] (column-sharded) and fc2 [4C, C]
(row-sharded) ARE head/hidden-aligned under plain contiguous sharding, so
they arrive pre-sharded with no gather.

Numerics: partial branch outputs are psum-ed in f32 (not the kernel's
bf16 output dtype), so TP=2 matches the single-device kernel to bf16
rounding; in f32 the match is ~1e-6.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .mesh import MODEL_AXIS, batch_axes
from ..ops import pallas_attention as pa


def _tp_size(mesh) -> int:
    return mesh.shape.get(MODEL_AXIS, 1)


def _rep_rank(rank):
    return P(*([None] * rank))


def _batch_spec(mesh, rank):
    """Batch rows split over the data axis — and the dcn axis too on a
    multi-slice mesh (keeps per-slice compute disjoint)."""
    return P(*([batch_axes(mesh)] + [None] * (rank - 1)))


def attention_branch_tp(mesh, x, ln_scale, ln_bias, wqkv, bqkv, wproj,
                        bproj, num_heads, seg_len, scale, ln_eps=1e-6,
                        use_ln=True, use_residual=True):
    """y = [x +] proj(block_diag_attn(qkv([LN](x)))) under head-split TP.

    x: [n_seg, seg_len, C] with n_seg sharded over the data axis.
    wqkv [C, 3C] replicated-in (gathered); wproj [C, C] row-sharded over
    the model axis. Each shard runs the rectangular megakernel on
    num_heads/tp heads; partials psum over the model axis.
    """
    tp = _tp_size(mesh)
    if tp == 1:
        return pa.fused_attention_residual(
            x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
            num_heads, seg_len, scale, ln_eps, use_ln, use_residual)
    if num_heads % tp:
        raise ValueError(f"num_heads={num_heads} not divisible by tp={tp}")
    C = x.shape[-1]
    C_loc = C // tp
    h_loc = num_heads // tp

    def body(x, ln_scale, ln_bias, wqkv, bqkv, wproj_loc, bproj):
        idx = jax.lax.axis_index(MODEL_AXIS)
        lo = idx * C_loc
        # head-aligned column slices of the (3, H, D)-ordered qkv weight
        wq = jax.lax.dynamic_slice(wqkv, (0, lo), (C, C_loc))
        wk = jax.lax.dynamic_slice(wqkv, (0, C + lo), (C, C_loc))
        wv = jax.lax.dynamic_slice(wqkv, (0, 2 * C + lo), (C, C_loc))
        w_loc = jnp.concatenate([wq, wk, wv], axis=1)        # [C, 3*C_loc]
        bq = jax.lax.dynamic_slice(bqkv, (lo,), (C_loc,))
        bk = jax.lax.dynamic_slice(bqkv, (C + lo,), (C_loc,))
        bv = jax.lax.dynamic_slice(bqkv, (2 * C + lo,), (C_loc,))
        b_loc = jnp.concatenate([bq, bk, bv])                # [3*C_loc]
        part = pa.fused_attention_residual(
            x, ln_scale, ln_bias, w_loc, b_loc, wproj_loc,
            jnp.zeros((C,), x.dtype), h_loc, seg_len, scale, ln_eps,
            use_ln, False)
        y = jax.lax.psum(part.astype(jnp.float32), MODEL_AXIS)
        y = y + bproj.astype(jnp.float32)
        if use_residual:
            y = y + x.astype(jnp.float32)
        return y.astype(x.dtype)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(_batch_spec(mesh, x.ndim), P(None), P(None), _rep_rank(2),
                  P(None), P(MODEL_AXIS, None), P(None)),
        out_specs=_batch_spec(mesh, x.ndim),
        check_vma=False,
    )(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj)


def attention_branch_tp_int8(mesh, x, ln_scale, ln_bias, wqkv_q, sqkv, bqkv,
                             wproj_q, sproj, bproj, num_heads, seg_len,
                             scale, ln_eps=1e-6, use_ln=True,
                             use_residual=True):
    """int8 (a8w8) serving form of attention_branch_tp: each model-shard
    runs the rectangular int8 megakernel on its heads. Same weight
    movement as bf16 (qkv replicated + head-sliced, proj row-sharded);
    the per-column weight scales travel with their columns/rows. Note the
    proj activation row-quant spans only the shard's Co columns, so TP
    int8 differs from single-device int8 at rounding level (bounded by
    the int8 cases in tests/test_tp_fused.py)."""
    tp = _tp_size(mesh)
    if tp == 1:
        return pa.fused_attention_residual_int8(
            x, ln_scale, ln_bias, wqkv_q, sqkv, bqkv, wproj_q, sproj,
            bproj, num_heads, seg_len, scale, ln_eps, use_ln, use_residual)
    if num_heads % tp:
        raise ValueError(f"num_heads={num_heads} not divisible by tp={tp}")
    C = x.shape[-1]
    C_loc = C // tp
    h_loc = num_heads // tp

    def body(x, ln_scale, ln_bias, wqkv_q, sqkv, bqkv, wproj_loc, sproj,
             bproj):
        idx = jax.lax.axis_index(MODEL_AXIS)
        lo = idx * C_loc

        def _sl3(a):   # head-aligned q|k|v column slices ([..., 3C] -> 3C_loc)
            if a.ndim == 2:
                parts = [jax.lax.dynamic_slice(a, (0, k * C + lo), (C, C_loc))
                         for k in range(3)]
            else:
                parts = [jax.lax.dynamic_slice(a, (k * C + lo,), (C_loc,))
                         for k in range(3)]
            return jnp.concatenate(parts, axis=-1)

        part = pa.fused_attention_residual_int8(
            x, ln_scale, ln_bias, _sl3(wqkv_q), _sl3(sqkv), _sl3(bqkv),
            wproj_loc, sproj, jnp.zeros((C,), x.dtype), h_loc, seg_len,
            scale, ln_eps, use_ln, False)
        y = jax.lax.psum(part.astype(jnp.float32), MODEL_AXIS)
        y = y + bproj.astype(jnp.float32)
        if use_residual:
            y = y + x.astype(jnp.float32)
        return y.astype(x.dtype)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(_batch_spec(mesh, x.ndim), P(None), P(None), _rep_rank(2),
                  P(None), P(None), P(MODEL_AXIS, None), P(None), P(None)),
        out_specs=_batch_spec(mesh, x.ndim),
        check_vma=False,
    )(x, ln_scale, ln_bias, wqkv_q, sqkv, bqkv, wproj_q, sproj, bproj)


def mlp_branch_tp_int8(mesh, x, ln_scale, ln_bias, w1_q, s1, b1, w2_q, s2,
                       b2, ln_eps=1e-6):
    """int8 (a8w8) serving form of mlp_branch_tp: fc1 column-sharded with
    its per-column scales, fc2 row-sharded (its per-output scales stay
    replicated — they belong to output channels), partials psum in f32."""
    tp = _tp_size(mesh)
    if tp == 1:
        return pa.fused_mlp_residual_int8(x, ln_scale, ln_bias, w1_q, s1,
                                          b1, w2_q, s2, b2, ln_eps)
    hid = w1_q.shape[-1]
    if hid % tp:
        raise ValueError(f"mlp hidden={hid} not divisible by tp={tp}")
    C = x.shape[-1]

    def body(x, ln_scale, ln_bias, w1_loc, s1_loc, b1_loc, w2_loc, s2, b2):
        part = pa.fused_mlp_residual_int8(
            x, ln_scale, ln_bias, w1_loc, s1_loc, b1_loc, w2_loc, s2,
            jnp.zeros((C,), x.dtype), ln_eps, False)
        y = jax.lax.psum(part.astype(jnp.float32), MODEL_AXIS)
        y = y + b2.astype(jnp.float32) + x.astype(jnp.float32)
        return y.astype(x.dtype)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(_batch_spec(mesh, x.ndim), P(None), P(None),
                  P(None, MODEL_AXIS), P(MODEL_AXIS), P(MODEL_AXIS),
                  P(MODEL_AXIS, None), P(None), P(None)),
        out_specs=_batch_spec(mesh, x.ndim),
        check_vma=False,
    )(x, ln_scale, ln_bias, w1_q, s1, b1, w2_q, s2, b2)


def mlp_branch_tp(mesh, x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps=1e-6):
    """y = x + fc2(gelu(fc1(LN(x)))) under hidden-split TP.

    fc1 [C, hid] column-sharded and fc2 [hid, C] row-sharded over the
    model axis arrive pre-sharded (contiguous hidden chunks are already
    aligned); partial branch outputs psum, residual + b2 added once."""
    tp = _tp_size(mesh)
    if tp == 1:
        return pa.fused_mlp_residual(x, ln_scale, ln_bias, w1, b1, w2, b2,
                                     ln_eps)
    hid = w1.shape[-1]
    if hid % tp:
        raise ValueError(f"mlp hidden={hid} not divisible by tp={tp}")
    C = x.shape[-1]

    def body(x, ln_scale, ln_bias, w1_loc, b1_loc, w2_loc, b2):
        part = pa.fused_mlp_residual(
            x, ln_scale, ln_bias, w1_loc, b1_loc, w2_loc,
            jnp.zeros((C,), x.dtype), ln_eps, False)
        y = jax.lax.psum(part.astype(jnp.float32), MODEL_AXIS)
        y = y + b2.astype(jnp.float32) + x.astype(jnp.float32)
        return y.astype(x.dtype)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(_batch_spec(mesh, x.ndim), P(None), P(None),
                  P(None, MODEL_AXIS), P(MODEL_AXIS), P(MODEL_AXIS, None),
                  P(None)),
        out_specs=_batch_spec(mesh, x.ndim),
        check_vma=False,
    )(x, ln_scale, ln_bias, w1, b1, w2, b2)
