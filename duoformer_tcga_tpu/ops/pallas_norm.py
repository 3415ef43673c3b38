"""Fused LayerNorm Pallas kernel.

Why: the XLA path of ops/nn.layernorm upcasts activations to f32 and
materializes intermediates; at DuoFormer scale the 24 per-batch LayerNorms
account for most of the gap between the measured transformer time and its
GEMM lower bound (69 ms of GEMMs inside a 195 ms stack —
docs/performance.md). This kernel reads each bf16 row tile once, computes
mean/variance in f32 registers, applies scale/bias, writes bf16 once.

Differentiable via custom_vjp (backward recomputes with the XLA
reference, which is what training would have used anyway).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 512


def _interpret() -> bool:
    env = os.environ.get("DUOFORMER_PALLAS_INTERPRET")
    if env is not None:
        return env == "1"
    from .pallas_attention import default_device_is_tpu
    return not default_device_is_tpu()


def use_fused_ln(x) -> bool:
    """Eligibility gate. DEFAULT OFF: measured on v5e, routing LN through
    a pallas_call made the DuoFormer stack ~15% SLOWER (225 vs 195 ms) —
    the kernel boundary forces materialization that XLA's own LN fusion
    avoids. Kept for shapes/workloads where XLA fusion fails;
    DUOFORMER_FUSED_LN=1 opts in."""
    env = os.environ.get("DUOFORMER_FUSED_LN")
    if env != "1":
        return False
    return x.shape[-1] % 128 == 0


def _ln_kernel(x_ref, scale_ref, bias_ref, out_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    out_ref[:] = y.astype(out_ref.dtype)


def _xla_reference(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def _impl(x, scale, bias, eps):
    *lead, C = x.shape
    n = 1
    for d in lead:
        n *= d
    flat = x.reshape(n, C)
    rt = min(ROW_TILE, max(8, n))
    n_pad = (-n) % rt
    if n_pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((n_pad, C), flat.dtype)], axis=0)
    rows = flat.shape[0]
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(rows // rt,),
        in_specs=[
            pl.BlockSpec((rt, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rt, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, C), x.dtype),
        interpret=_interpret(),
    )(flat, scale.reshape(1, C), bias.reshape(1, C))
    if n_pad:
        out = out[:n]
    return out.reshape(*lead, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layernorm(x, scale, bias, eps=1e-6):
    """LayerNorm over the last axis; x: [..., C], C % 128 == 0."""
    return _impl(x, scale, bias, eps)


def _fwd(x, scale, bias, eps):
    return _impl(x, scale, bias, eps), (x, scale, bias)


def _bwd(eps, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda a, s, b: _xla_reference(a, s, b, eps),
                     x, scale, bias)
    return vjp(g)


fused_layernorm.defvjp(_fwd, _bwd)
