"""int8 weight quantization for the serving path (opt-in).

Weight-side: symmetric per-output-channel int8 (w = w_q * s_col).
Activation-side: symmetric per-row dynamic int8, computed inside the
kernel. The a8w8 matmul runs on the v5e MXU at 2x bf16 throughput; the
f32 dequant is an outer product of the two scale vectors fused into the
epilogue.

Accuracy is workload-dependent — this is an OPT-IN serving mode
(`Predictor(quantize=True)`); the bf16 path remains the parity-tested
default. Expected logit drift is bounded by tests at the model level.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w, axis=0):
    """Symmetric per-channel int8. w: [in, out] -> (w_q int8 [in, out],
    scale f32 [out]) with w ~= w_q * scale."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return w_q.astype(jnp.int8), scale.astype(jnp.float32)


def quantize_linear_params(p):
    """{'w': f32/bf16 [in,out], 'b'?} -> {'w_q', 'w_scale', 'b'?}."""
    w_q, s = quantize_weight(p["w"])
    out = {"w_q": w_q, "w_scale": s}
    if "b" in p:
        out["b"] = p["b"]
    return out


def _quantize_stacked_linear(fp):
    """Stacked [depth, in, out] linear -> {'w_q', 'w_scale', 'b'?}
    quantized per (depth, out) channel."""
    w = fp["w"].astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=1)                   # [depth, out]
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    w_q = jnp.clip(jnp.round(w / scale[:, None, :]), -127, 127)
    q = {"w_q": w_q.astype(jnp.int8), "w_scale": scale}
    if "b" in fp:
        q["b"] = fp["b"]
    return q


def _check_quantizable(params):
    """int8 serving covers the release DuoFormer family (MultiscaleFormer
    core, no LayerScale): the int8 megakernels carry no gamma epilogue and
    the XLA fallback cannot consume w_q trees, so refuse loudly here
    instead of KeyError-ing mid-forward (models/transformer.py
    _can_megafuse documents this contract)."""
    tf = params.get("transformer", {})
    if "scale_blocks" not in tf:
        raise ValueError(
            "int8 quantization supports the release DuoFormer family "
            "(transformer.scale_blocks); this param tree has keys "
            f"{sorted(tf)} — the legacy/ScaleFormer cores have no int8 "
            "kernel instantiations")
    for stack in ("scale_blocks", "patch_blocks"):
        if "ls1" in tf.get(stack, {}):
            raise ValueError(
                f"int8 quantization does not support LayerScale blocks "
                f"({stack}.ls1 present): the int8 kernels have no gamma "
                f"epilogue — serve this model in bf16 (quantize=False)")


def quantize_mlp_weights(params):
    """Quantize every scale-block MLP (fc1/fc2) in a DuoFormer param tree
    (the dominant GEMMs). Returns a new tree; non-MLP weights untouched."""
    import copy

    _check_quantizable(params)
    out = copy.copy(params)
    tf = dict(params["transformer"])
    sb = dict(tf["scale_blocks"])
    mlp = {k: (_quantize_stacked_linear(v) if k in ("fc1", "fc2") else v)
           for k, v in sb["mlp"].items()}
    sb["mlp"] = mlp
    tf["scale_blocks"] = sb
    out["transformer"] = tf
    return out


def quantize_attention_weights(params):
    """Quantize the attention qkv/proj GEMMs of both transformer stacks
    (scale_blocks.attn + patch_blocks.attn). With quantize_mlp_weights this
    puts every transformer GEMM on the int8 MXU path; the attention core
    (softmax over <=86-token segments) stays bf16."""
    import copy

    _check_quantizable(params)
    out = copy.copy(params)
    tf = dict(params["transformer"])
    for stack in ("scale_blocks", "patch_blocks"):
        if stack not in tf:
            continue
        sb = dict(tf[stack])
        attn = {k: (_quantize_stacked_linear(v) if k in ("qkv", "proj")
                    else v)
                for k, v in sb["attn"].items()}
        sb["attn"] = attn
        tf[stack] = sb
    out["transformer"] = tf
    return out
