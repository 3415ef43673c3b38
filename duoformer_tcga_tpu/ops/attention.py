"""Multi-head attention ops for DuoFormer's two attention patterns.

Two patterns, both with small static sequence lengths:
  * scale attention: MHSA over the <=86 multi-scale tokens *within* each of
    the 49 regions, batched over B*49 (reference: forward_with_scale,
    /root/reference/models/multiscale_attn.py:149-166 and AttentionForScale,
    /root/reference/models/scale_attention.py:28-45).
  * patch/region attention: MHSA over CLS + 49 region tokens
    (AttentionForPatch, scale_attention.py:180-211; forward_with_region,
    multiscale_attn.py:190-221).

Sequence lengths are tiny (S+1 in {2,6,22,86}; 50 for patch attention), so
the computation is QKV/proj-matmul-bound, not attention-bound. The default
path below expresses the whole thing as batched einsums that XLA maps onto
the MXU; a fused Pallas kernel (ops/pallas_attention.py) is available behind
`use_pallas=True` for the softmax(QK^T)V core.

Scale factor quirk (SURVEY Q12): the `MyModel` variant uses
scale = 2 * dim**-0.5 shared by BOTH its scale and region passes
(multiscale_attn.py:142,212); the release variant uses the standard
head_dim**-0.5. Callers pass `scale` explicitly.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp

from . import nn


def attention_init(key, dim, num_heads=8, qkv_bias=True, qk_norm=False,
                   dtype=jnp.float32):
    """One attention parameter set: qkv (dim -> 3*dim) + output proj.

    qk_norm=True adds per-head LayerNorms over head_dim on q/k (timm qk_norm
    hook, used by AttentionForPatch when enabled, scale_attention.py:201)."""
    k1, k2 = jax.random.split(key)
    p = {
        "qkv": nn.linear_init(k1, dim, 3 * dim, bias=qkv_bias, scheme="vit", dtype=dtype),
        "proj": nn.linear_init(k2, dim, dim, scheme="vit", dtype=dtype),
    }
    if qk_norm:
        head_dim = dim // num_heads
        p["q_norm"] = nn.layernorm_init(head_dim, dtype)
        p["k_norm"] = nn.layernorm_init(head_dim, dtype)
    return p


def _qkv_heads(params, x, num_heads):
    """x: [..., S, C] -> q, k, v each [..., H, S, D]."""
    *lead, S, C = x.shape
    D = C // num_heads
    qkv = nn.linear(params["qkv"], x)                     # [..., S, 3C]
    qkv = qkv.reshape(*lead, S, 3, num_heads, D)
    # torch layout: reshape(..., 3, H, D) then permute heads before seq.
    qkv = jnp.moveaxis(qkv, (-3, -2), (0, -3))            # [3, ..., H, S, D]
    return qkv[0], qkv[1], qkv[2]


def _sdpa(q, k, v, scale, attn_drop=0.0, rng=None, train=False):
    """softmax(q k^T * scale) v over the last two axes. f32 softmax."""
    attn = jnp.einsum("...sd,...td->...st", q, k,
                      preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(attn, axis=-1)
    attn = nn.dropout(attn, attn_drop, rng, train)
    out = jnp.einsum("...st,...td->...sd", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


import contextlib
import os

# Trace-time override: pallas_call does not partition over sharded
# operands, so SPMD tensor-parallel tracing must take the XLA attention
# path (the partitioner handles sharded einsums + collectives). Engaged by
# force_xla_path(), e.g. from make_train_step when the mesh has a model
# axis > 1 — it outranks even DUOFORMER_FUSED_ATTN=1.
_FORCE_XLA = False

# Trace-time TP mesh: when set (tp_fused_path), attention/MLP branches run
# the fused kernels PER model-shard via jax.shard_map (parallel/tp_fused.py)
# instead of dropping to the XLA path — Megatron head/hidden-split with one
# psum per branch. force_xla_path still outranks this.
_TP_MESH = None


@contextlib.contextmanager
def force_xla_path():
    """Disable every fused Pallas path for code traced inside this block."""
    global _FORCE_XLA
    prev = _FORCE_XLA
    _FORCE_XLA = True
    try:
        yield
    finally:
        _FORCE_XLA = prev


@contextlib.contextmanager
def tp_fused_path(mesh):
    """Run fused kernels per model-shard (shard_map) for code traced inside
    this block. mesh: a ("data", "model") Mesh with model axis > 1."""
    global _TP_MESH
    prev = _TP_MESH
    _TP_MESH = mesh
    try:
        yield
    finally:
        _TP_MESH = prev


def _use_fused(params, attn_drop, train, C=None, apply_qk_norm=True):
    """Fused-kernel eligibility: no APPLIED qk-norm (params that merely
    carry q_norm/k_norm weights — the Q9 created-but-unused case — stay
    eligible), no active attention dropout, lane-aligned feature dim
    (hardware-validated at head_dim 64). Env override
    DUOFORMER_FUSED_ATTN=0/1 (read per-call so tests can toggle it)."""
    if _FORCE_XLA:
        return False
    if "w_q" in params.get("qkv", {}):
        return True    # int8 serving weights exist only on the fused path
    env = os.environ.get("DUOFORMER_FUSED_ATTN")
    if env == "0":
        return False
    if (apply_qk_norm and "q_norm" in params) or (train and attn_drop > 0.0):
        return False
    if env == "1":
        return True
    if C is not None and C % 128 != 0:
        return False
    from . import pallas_attention as pa
    return pa.default_device_is_tpu()


def multihead_attention(params, x, num_heads, scale=None, attn_drop=0.0,
                        proj_drop=0.0, rng=None, train=False,
                        qk_norm_eps=1e-6, fused=None, apply_qk_norm=True):
    """Generic MHSA over the second-to-last axis. x: [..., S, C].

    Leading axes are batch-like (e.g. [B, 49] for scale attention), so one
    call covers both DuoFormer attention patterns. On TPU the
    softmax(QK^T)V core runs the fused Pallas block-diagonal kernel
    (ops/pallas_attention.py) unless qk-norm / attention dropout require
    the reference path; set DUOFORMER_FUSED_ATTN=0/1 to force.

    apply_qk_norm=False carries q_norm/k_norm params WITHOUT applying
    them — the reference's Q9 behavior: the positional-arg bug creates
    per-head q/k LayerNorms (stored in checkpoints) but the hand-written
    forwards never call them, except AttentionForPatch.forward
    (scale_attention.py:201) which does.
    """
    *lead, S, C = x.shape
    D = C // num_heads
    if scale is None:
        scale = D ** -0.5
    r1 = r2 = None
    if train and rng is not None:
        r1, r2 = jax.random.split(rng)
    # Active attention-matrix dropout dispatches to the reg megakernel
    # (in-kernel hash-counter masks) instead of falling off the fused path
    # — except under a TP mesh (shard_map kernels carry no dropout) or
    # int8 weights (serving-only)
    reg_drop = (train and attn_drop > 0.0 and r1 is not None
                and _TP_MESH is None
                and "w_q" not in params.get("qkv", {}))
    if fused is None:
        fused = _use_fused(params, 0.0 if reg_drop else attn_drop, train,
                           C, apply_qk_norm)

    if fused:
        # qkv GEMM + attention + output proj in ONE kernel (the
        # bare-attention form of the megakernel: no LN, no residual)
        from . import pallas_attention as pa
        n_seg = 1
        for d in lead:
            n_seg *= d
        zeros_c = jnp.zeros((C,), x.dtype)
        if _TP_MESH is not None and "w_q" in params["qkv"]:
            # int8 under head-split TP: rectangular int8 megakernel per
            # model-shard (parallel/tp_fused.py)
            from ..parallel import tp_fused
            out = tp_fused.attention_branch_tp_int8(
                _TP_MESH, x.reshape(n_seg, S, C), zeros_c, zeros_c,
                params["qkv"]["w_q"], params["qkv"]["w_scale"],
                params["qkv"].get("b", jnp.zeros((3 * C,), x.dtype)),
                params["proj"]["w_q"], params["proj"]["w_scale"],
                params["proj"].get("b", zeros_c),
                num_heads, S, float(scale), 1e-6, False, False)
            out = out.reshape(*lead, S, C)
            out = nn.dropout(out, proj_drop, r2, train)
            return out
        if _TP_MESH is not None:
            # head-split TP: same megakernel per model-shard (shard_map)
            from ..parallel import tp_fused
            out = tp_fused.attention_branch_tp(
                _TP_MESH, x.reshape(n_seg, S, C), zeros_c, zeros_c,
                params["qkv"]["w"].astype(x.dtype),
                params["qkv"].get("b", jnp.zeros((3 * C,), x.dtype)),
                params["proj"]["w"].astype(x.dtype),
                params["proj"].get("b", zeros_c),
                num_heads, S, float(scale), 1e-6, False, False)
            out = out.reshape(*lead, S, C)
            out = nn.dropout(out, proj_drop, r2, train)
            return out
        if "w_q" in params["qkv"]:
            # int8 serving weights (ops/quantize.quantize_attention_weights)
            out = pa.fused_attention_residual_int8(
                x.reshape(n_seg, S, C), zeros_c, zeros_c,
                params["qkv"]["w_q"], params["qkv"]["w_scale"],
                params["qkv"].get("b", jnp.zeros((3 * C,), x.dtype)),
                params["proj"]["w_q"], params["proj"]["w_scale"],
                params["proj"].get("b", zeros_c),
                num_heads, S, float(scale), 1e-6, False, False)
        elif reg_drop:
            seed = jax.random.randint(r1, (), -2**31, 2**31 - 1, jnp.int32)
            out = pa.fused_attention_residual_reg(
                x.reshape(n_seg, S, C), zeros_c, zeros_c,
                params["qkv"]["w"].astype(x.dtype),
                params["qkv"].get("b", jnp.zeros((3 * C,), x.dtype)),
                params["proj"]["w"].astype(x.dtype),
                params["proj"].get("b", zeros_c),
                jnp.ones((C,), x.dtype), seed,
                num_heads, S, float(scale), 1e-6, False, False,
                attn_drop, 0.0)
        else:
            out = pa.fused_attention_residual(
                x.reshape(n_seg, S, C), zeros_c, zeros_c,
                params["qkv"]["w"].astype(x.dtype),
                params["qkv"].get("b", jnp.zeros((3 * C,), x.dtype)),
                params["proj"]["w"].astype(x.dtype),
                params["proj"].get("b", zeros_c),
                num_heads, S, float(scale), 1e-6, False, False)
        out = out.reshape(*lead, S, C)
        out = nn.dropout(out, proj_drop, r2, train)
        return out
    else:
        q, k, v = _qkv_heads(params, x, num_heads)
        if apply_qk_norm and "q_norm" in params:
            q = nn.layernorm(params["q_norm"], q, eps=qk_norm_eps)
            k = nn.layernorm(params["k_norm"], k, eps=qk_norm_eps)
        out = _sdpa(q, k, v, scale, attn_drop, r1, train)  # [..., H, S, D]
        out = jnp.moveaxis(out, -3, -2).reshape(*lead, S, C)
    out = nn.linear(params["proj"], out)
    out = nn.dropout(out, proj_drop, r2, train)
    return out
