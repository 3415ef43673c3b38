"""Functional neural-net primitives (the framework's "nn" layer).

Pure functions over explicit parameter pytrees (nested dicts of jnp arrays).
Conventions, chosen TPU-first:
  * Linear weights are stored (in_features, out_features) so the forward is a
    plain `x @ w` that lowers straight onto the MXU (torch stores the
    transpose; the checkpoint converter in utils/torch_convert.py maps it).
  * Convolutions are NHWC with HWIO kernels (XLA's preferred TPU layout;
    the reference is NCHW/OIHW, see e.g. /root/reference/models/projection_head.py:16).
  * Matmuls/convs run in the caller's compute dtype (bf16 on TPU) with
    float32 accumulation via preferred_element_type.
  * BatchNorm defaults to inference semantics (running stats), matching how
    the frozen backbone is evaluated (/root/reference/main_toy.py:39-54);
    training-mode batch stats are available for the unfrozen path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from . import initializers as init


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------

def linear_init(key, in_features, out_features, bias=True, scheme="vit",
                dtype=jnp.float32):
    """scheme: 'vit' (trunc_normal .02 / zero bias, timm ViT init),
    'torch' (torch nn.Linear default), 'xavier' (xavier_uniform /
    normal(1e-6) bias, reference projection-head Linear init,
    projection_head.py:128-132)."""
    kw, kb = jax.random.split(key)
    if scheme == "vit":
        w = init.trunc_normal(kw, (in_features, out_features), std=0.02, dtype=dtype)
        b = init.zeros((out_features,), dtype) if bias else None
    elif scheme == "torch":
        w = init.torch_default_linear_weight(kw, (in_features, out_features), dtype)
        b = (init.torch_default_bias(kb, (out_features,), in_features, dtype)
             if bias else None)
    elif scheme == "xavier":
        w = init.xavier_uniform(kw, (in_features, out_features), dtype)
        b = init.normal(kb, (out_features,), std=1e-6, dtype=dtype) if bias else None
    else:
        raise ValueError(f"unknown linear init scheme: {scheme}")
    p = {"w": w}
    if b is not None:
        p["b"] = b
    return p


def linear(params, x):
    y = jnp.dot(x, params["w"].astype(x.dtype),
                preferred_element_type=jnp.float32)
    if "b" in params:
        y = y + params["b"].astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# LayerNorm
# ---------------------------------------------------------------------------

def layernorm_init(dim, dtype=jnp.float32):
    return {"scale": init.ones((dim,), dtype), "bias": init.zeros((dim,), dtype)}


def layernorm(params, x, eps=1e-6):
    """LayerNorm over the last axis. Stats in float32 for TPU numerics.

    On TPU, lane-aligned feature dims route to the fused Pallas kernel
    (ops/pallas_norm.py) — one bf16 read + one bf16 write instead of f32
    materialization; DUOFORMER_FUSED_LN=0/1 overrides."""
    from . import pallas_norm
    if pallas_norm.use_fused_ln(x):
        return pallas_norm.fused_layernorm(x, params["scale"],
                                           params["bias"], eps)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Conv2D (NHWC / HWIO)
# ---------------------------------------------------------------------------

def conv_init(key, kh, kw, cin, cout, bias=True, scheme="kaiming",
              dtype=jnp.float32):
    """scheme: 'kaiming' (reference projection convs, projection_head.py:122),
    'torch' (torch Conv2d default, used by backbone convs when trained from
    scratch)."""
    kw_key, kb_key = jax.random.split(key)
    shape = (kh, kw, cin, cout)
    if scheme == "kaiming":
        w = init.kaiming_normal_conv(kw_key, shape, dtype)
        b = init.normal(kb_key, (cout,), std=1e-6, dtype=dtype) if bias else None
    elif scheme == "torch":
        w = init.torch_default_conv_weight(kw_key, shape, dtype)
        fan_in = kh * kw * cin
        b = (init.torch_default_bias(kb_key, (cout,), fan_in, dtype)
             if bias else None)
    else:
        raise ValueError(f"unknown conv init scheme: {scheme}")
    p = {"w": w}
    if b is not None:
        p["b"] = b
    return p


def conv2d(params, x, stride=1, padding="SAME"):
    """x: [N,H,W,C] NHWC; params['w']: HWIO.

    padding: 'SAME', 'VALID', or an int (symmetric torch-style padding).
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    # No preferred_element_type: the TPU MXU accumulates bf16 convs in f32
    # internally regardless; widening the OUTPUT breaks the conv transpose
    # rule under autodiff (f32 cotangent vs bf16 weights).
    y = jax.lax.conv_general_dilated(
        x, params["w"].astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in params:
        y = (y.astype(jnp.float32) + params["b"].astype(jnp.float32))
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# BatchNorm2D (NHWC, channel-last)
# ---------------------------------------------------------------------------

def batchnorm_init(ch, dtype=jnp.float32):
    return {
        "scale": init.ones((ch,), dtype),
        "bias": init.zeros((ch,), dtype),
        "mean": init.zeros((ch,), dtype),
        "var": init.ones((ch,), dtype),
    }


def batchnorm(params, x, eps=1e-5, train=False):
    """Inference-mode BN by default (running stats), torch eps default 1e-5.

    train=True uses per-batch statistics (biased variance, matching torch's
    normalization in train mode); running-stat *updates* are handled by the
    optimizer loop, not here, to keep this function pure.
    """
    xf = x.astype(jnp.float32)
    if train:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(xf, axis=axes)
        var = jnp.mean(jnp.square(xf - mean), axis=axes)
    else:
        mean = params["mean"].astype(jnp.float32)
        var = params["var"].astype(jnp.float32)
    inv = jax.lax.rsqrt(var + eps) * params["scale"].astype(jnp.float32)
    y = (xf - mean) * inv + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def batchnorm_stats(params, x, eps=1e-5, momentum=0.1):
    """Train-mode BN that ALSO returns momentum-updated running stats —
    the torch nn.BatchNorm2d train() behavior the reference relies on
    (main_toy.py:20 keeps BN in batch-stat mode every step; torchvision
    momentum 0.1). Normalization uses the biased batch variance; the
    running-var update uses the UNBIASED one (Bessel), exactly as torch.

    Returns (y, {"mean": new_running_mean, "var": new_running_var}) with
    the updates stop_gradient'ed (they are state, not a differentiable
    path)."""
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    n = 1
    for a in axes:
        n *= x.shape[a]
    mean = jnp.mean(xf, axis=axes)
    var = jnp.mean(jnp.square(xf - mean), axis=axes)
    inv = jax.lax.rsqrt(var + eps) * params["scale"].astype(jnp.float32)
    y = ((xf - mean) * inv + params["bias"].astype(jnp.float32)).astype(x.dtype)
    var_unbiased = var * (n / max(n - 1, 1))
    upd = {
        "mean": jax.lax.stop_gradient(
            (1 - momentum) * params["mean"].astype(jnp.float32)
            + momentum * mean).astype(params["mean"].dtype),
        "var": jax.lax.stop_gradient(
            (1 - momentum) * params["var"].astype(jnp.float32)
            + momentum * var_unbiased).astype(params["var"].dtype),
    }
    return y, upd


def groupnorm_init(ch, dtype=jnp.float32):
    return {"scale": init.ones((ch,), dtype), "bias": init.zeros((ch,), dtype)}


def groupnorm(params, x, groups=32, eps=1e-5):
    """GroupNorm over NHWC (torch nn.GroupNorm semantics: normalize each
    group of channels over (H, W, C/g) per sample). Used by the timm
    ResNetV2 hybrid stems (vit_base_r50_s16 etc., GroupNormAct 32)."""
    N, H, W, C = x.shape
    g = groups
    xf = x.astype(jnp.float32).reshape(N, H * W, g, C // g)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(N, H, W, C)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def stdconv2d(params, x, stride=1, padding="SAME", eps=1e-8):
    """Weight-standardized conv (timm StdConv2dSame, eps 1e-8): the HWIO
    kernel is standardized per OUTPUT channel over (H, W, I) at every
    forward — the BiT / ViT-hybrid stem convolution."""
    w = params["w"].astype(jnp.float32)
    mean = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
    var = jnp.mean(jnp.square(w - mean), axis=(0, 1, 2), keepdims=True)
    w_hat = (w - mean) * jax.lax.rsqrt(var + eps)
    p = dict(params)
    p["w"] = w_hat
    return conv2d(p, x, stride=stride, padding=padding)


def fold_batchnorm(bn_params, eps=1e-5):
    """Fold inference BN into a per-channel (scale, bias) pair so XLA fuses it
    into the preceding conv. Returns dict usable with `affine`."""
    inv = jax.lax.rsqrt(bn_params["var"].astype(jnp.float32) + eps)
    scale = bn_params["scale"].astype(jnp.float32) * inv
    bias = (bn_params["bias"].astype(jnp.float32)
            - bn_params["mean"].astype(jnp.float32) * scale)
    return {"scale": scale, "bias": bias}


def affine(params, x):
    return (x.astype(jnp.float32) * params["scale"] + params["bias"]).astype(x.dtype)


# ---------------------------------------------------------------------------
# Pooling
# ---------------------------------------------------------------------------

def maxpool2d(x, window=2, stride=2, padding="VALID"):
    """torch MaxPool2d semantics (floor mode). x: NHWC."""
    if isinstance(window, int):
        window = (window, window)
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
        return jax.lax.reduce_window(
            x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
            jax.lax.max, (1,) + window + (1,), (1,) + stride + (1,), padding)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1,) + window + (1,), (1,) + stride + (1,), padding)


def avgpool_global(x):
    """Global average pool NHWC -> NC (torch AdaptiveAvgPool2d((1,1)) + flatten)."""
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Activations / dropout
# ---------------------------------------------------------------------------

def gelu(x):
    """Exact GELU (torch nn.GELU default), computed in f32."""
    return jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)


def relu(x):
    return jnp.maximum(x, 0)


def dropout(x, rate, rng: Optional[jax.Array], train: bool):
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0).astype(x.dtype)


def drop_path(x, rate, rng: Optional[jax.Array], train: bool):
    """Stochastic depth (timm DropPath): drop the whole residual branch
    per-sample, rescaled by 1/keep. Supports traced `rate` (so a stack's
    linspace of rates can ride a lax.scan)."""
    if not train or rng is None:
        return x
    if isinstance(rate, (int, float)) and rate == 0.0:   # static fast path
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0).astype(x.dtype)


# ---------------------------------------------------------------------------
# MLP (timm Mlp: fc1 -> act -> drop -> fc2 -> drop)
# ---------------------------------------------------------------------------

def mlp_init(key, dim, hidden, scheme="vit", dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, dim, hidden, scheme=scheme, dtype=dtype),
        "fc2": linear_init(k2, hidden, dim, scheme=scheme, dtype=dtype),
    }


def mlp(params, x, drop=0.0, rng=None, train=False):
    x = linear(params["fc1"], x)
    x = gelu(x)
    if drop > 0.0 and train and rng is not None:
        # rng=None skips dropout (same contract as nn.dropout) instead of
        # crashing in jax.random.split
        r1, rng = jax.random.split(rng)
        x = dropout(x, drop, r1, train)
    x = linear(params["fc2"], x)
    x = dropout(x, drop, rng, train)
    return x
