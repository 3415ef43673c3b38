"""Scanned-forward / unrolled-backward fused block stack.

Measured motivation (probes/_probe_r3_scanovh.py, B=256 shapes, v5e):
the backward of `lax.scan` over fused transformer blocks serializes each
block's weight-grad GEMMs with the backward-kernel chain — a sequential
loop gives XLA's scheduler no cross-block freedom. Python-unrolled, the
same 12-block stack runs 42.6 ms/step faster (328 vs 371 ms) because the
dW GEMMs interleave with neighboring blocks' backward kernels. Fully
unrolling the train step is rejected by the AOT compile service
(probes/_probe_r3_unroll.py), but only the BACKWARD benefits — the
forward shows no scan penalty (92 vs 101 ms) — so this module keeps the
forward as `lax.scan` and hand-rolls the backward as a python loop via
`jax.custom_vjp`, reusing the per-block backward building blocks
(`_fused_block_bwd_impl`, `_fmr_bwd_saved_hidden`).

Residual memory is IDENTICAL to the scan path: per block it saves the
block input x, the attention-branch output y (the MLP input), and the
pre-GELU hidden z — exactly what the per-block custom vjps save today.

Eligibility mirrors the plain (non-reg) megafused path: no dropout, no
LayerScale, no applied qk-norm, no int8/TP, save-hidden MLP backward on.
Reg configs keep the scan path. Gate: transformer._use_unrolled_bwd;
knob DUOFORMER_UNROLL_BWD (docs/knobs.md).

Stack parity with the reference: this computes the same 12 chained
ScaleBlocks as /root/reference/models/scale_attention.py:96-170,239-344
— only the autodiff schedule differs (tested identical to the scan path
in tests/test_stack_bwd.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

from . import pallas_attention as pa


def _bwd_group_size(depth):
    """How many consecutive blocks to python-unroll inside one backward
    scan step. The fully-unrolled backward (group = depth) gives the
    scheduler maximal freedom but the 12x-duplicated HLO is rejected by
    constrained AOT compile toolchains; a group of 3-4 captures the
    neighbor-overlap win (block i's dW GEMMs interleave with block i+1's
    backward kernels) at a third of the graph size. Clamped to the
    largest divisor of depth <= the requested size."""
    g = int(os.environ.get("DUOFORMER_UNROLL_BWD_GROUP", "4"))
    g = max(1, min(g, depth))
    while depth % g != 0:
        g -= 1
    return g

STACK_KEYS = ("lns1", "lnb1", "wqkv", "bqkv", "wproj", "bproj",
              "lns2", "lnb2", "w1", "b1", "w2", "b2")


def stack_weights(stacked_blocks, dtype):
    """Extract the megakernel operand arrays from a stacked ScaleBlock
    param pytree ([depth, ...] leaves, layout of transformer.scale_block_init)
    into the flat dict fused_stack_residual consumes. Casts happen HERE
    (outside the custom vjp) so autodiff routes the weight grads back to
    the original param dtype/leaves."""
    attn = stacked_blocks["attn"]
    mlp = stacked_blocks["mlp"]
    depth = stacked_blocks["norm1"]["scale"].shape[0]
    threeC = attn["qkv"]["w"].shape[-1]
    C = threeC // 3
    hidden = mlp["fc1"]["w"].shape[-1]
    zeros = lambda shape: jnp.zeros((depth,) + shape, dtype)
    return {
        "lns1": stacked_blocks["norm1"]["scale"].astype(dtype),
        "lnb1": stacked_blocks["norm1"]["bias"].astype(dtype),
        "wqkv": attn["qkv"]["w"].astype(dtype),
        "bqkv": (attn["qkv"]["b"].astype(dtype) if "b" in attn["qkv"]
                 else zeros((threeC,))),
        "wproj": attn["proj"]["w"].astype(dtype),
        "bproj": (attn["proj"]["b"].astype(dtype) if "b" in attn["proj"]
                  else zeros((C,))),
        "lns2": stacked_blocks["norm2"]["scale"].astype(dtype),
        "lnb2": stacked_blocks["norm2"]["bias"].astype(dtype),
        "w1": mlp["fc1"]["w"].astype(dtype),
        "b1": (mlp["fc1"]["b"].astype(dtype) if "b" in mlp["fc1"]
               else zeros((hidden,))),
        "w2": mlp["fc2"]["w"].astype(dtype),
        "b2": (mlp["fc2"]["b"].astype(dtype) if "b" in mlp["fc2"]
               else zeros((C,))),
    }


def _stack_fwd_scan(x, w, num_heads, seg_len, scale, ln_eps):
    """Forward scan over the stacked blocks, emitting the per-block
    residuals the unrolled backward needs: (x_in, y_attn_out, z_hidden)."""
    def body(c, wi):
        y = pa._fused_block_impl(
            c, wi["lns1"], wi["lnb1"], wi["wqkv"], wi["bqkv"],
            wi["wproj"], wi["bproj"], num_heads, seg_len, scale, ln_eps,
            True, True)
        out, z = pa._fused_mlp_impl(
            y, wi["lns2"], wi["lnb2"], wi["w1"], wi["b1"], wi["w2"],
            wi["b2"], ln_eps, True, return_hidden=True)
        return out, (c, y, z)
    return lax.scan(body, x, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_stack_residual(x, w, num_heads, seg_len, scale, ln_eps):
    """x: [n_seg, S, C] through depth chained fused ScaleBlocks
    (attention-residual then MLP-residual, both megakernels). w: dict of
    STACK_KEYS with [depth, ...] leaves, already in x.dtype.

    Numerically identical to scanning fused_attention_residual +
    fused_mlp_residual; only the backward SCHEDULE differs (unrolled)."""
    out, _ = _stack_fwd_scan(x, w, num_heads, seg_len, scale, ln_eps)
    return out


def _fsr_fwd(x, w, num_heads, seg_len, scale, ln_eps):
    out, (xs, ys, zs) = _stack_fwd_scan(x, w, num_heads, seg_len, scale,
                                        ln_eps)
    return out, (xs, ys, zs, w)


def _block_bwd(wi, xi, yi, zi, g, num_heads, seg_len, scale, ln_eps):
    """One ScaleBlock's backward: MLP-residual from the saved pre-GELU
    hidden (_fmr_bwd_saved_hidden), then the attention-residual fused
    backward kernel + XLA dW GEMMs (same math as the per-block custom
    vjps). Returns (dx, dw_dict)."""
    n_seg, S, C = xi.shape
    dy, dlns2, dlnb2, dw1, db1, dw2, db2 = pa._fmr_bwd_saved_hidden(
        yi, g, zi, wi["lns2"], wi["lnb2"], wi["w1"], wi["b1"],
        wi["w2"], wi["b2"], ln_eps, True)
    dx, ln, attn, dqkv, dlns1, dlnb1, dbq, dbp = pa._fused_block_bwd_impl(
        xi, dy, wi["lns1"], wi["lnb1"], wi["wqkv"], wi["bqkv"],
        wi["wproj"], num_heads, seg_len, scale, ln_eps, True, True)
    g2d = dy.reshape(n_seg * S, C)
    if ln.shape[0] != g2d.shape[0]:
        g2d = jnp.concatenate(
            [g2d, jnp.zeros((ln.shape[0] - g2d.shape[0], C), dy.dtype)],
            axis=0)
    dwqkv = lax.dot_general(ln, dqkv, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    dwproj = lax.dot_general(attn, g2d, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return dx, {
        "lns1": dlns1.astype(wi["lns1"].dtype),
        "lnb1": dlnb1.astype(wi["lnb1"].dtype),
        "wqkv": dwqkv.astype(wi["wqkv"].dtype),
        "bqkv": dbq.astype(wi["bqkv"].dtype),
        "wproj": dwproj.astype(wi["wproj"].dtype),
        "bproj": dbp.astype(wi["bproj"].dtype),
        "lns2": dlns2, "lnb2": dlnb2,
        "w1": dw1, "b1": db1, "w2": dw2, "b2": db2,
    }


def _group_bwd(group_res, g, n, num_heads, seg_len, scale, ln_eps):
    """Backward through n consecutive blocks, python-unrolled (last to
    first). group_res leaves have a leading [n] axis."""
    xs, ys, zs, w = group_res
    per_block = []
    for i in reversed(range(n)):
        wi = jax.tree.map(lambda a: a[i], w)
        g, dw_i = _block_bwd(wi, xs[i], ys[i], zs[i], g,
                             num_heads, seg_len, scale, ln_eps)
        per_block.append(dw_i)
    per_block.reverse()
    dw = {k: jnp.stack([b[k] for b in per_block]) for k in STACK_KEYS}
    return g, dw


def _fsr_bwd(num_heads, seg_len, scale, ln_eps, res, g):
    xs, ys, zs, w = res
    depth = xs.shape[0]
    gsize = _bwd_group_size(depth)
    if gsize == depth:
        return _group_bwd((xs, ys, zs, w), g, depth,
                          num_heads, seg_len, scale, ln_eps)
    # Reverse scan over groups of gsize blocks, python-unrolled within a
    # group: the overlap win is neighbor-local, so a small group captures
    # most of it while keeping the HLO gsize-x instead of depth-x (the
    # AOT compile service rejects the fully-unrolled step graph).
    n_groups = depth // gsize
    regroup = lambda a: a.reshape((n_groups, gsize) + a.shape[1:])
    grouped = jax.tree.map(regroup, (xs, ys, zs, w))

    def body(carry, gr):
        return _group_bwd(gr, carry, gsize, num_heads, seg_len, scale,
                          ln_eps)

    g, dw_g = lax.scan(body, g, grouped, reverse=True)
    dw = {k: v.reshape((depth,) + v.shape[2:]) for k, v in dw_g.items()}
    return g, dw


fused_stack_residual.defvjp(_fsr_fwd, _fsr_bwd)
