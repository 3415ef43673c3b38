"""Fused block-diagonal attention — the Pallas kernel for DuoFormer's
scale/patch attention patterns.

Why a kernel: DuoFormer's attentions run over many tiny independent
segments (S+1 in {2,6,22,86} tokens per region, batched over B*49 regions;
50 tokens per image for patch attention). The XLA path materializes
per-head tensors shaped [..., S, head_dim] whose trailing dims (S<=86,
D=64) tile far below the TPU's (8,128) native tile, inflating HBM traffic
~5x in transposes around the (cheap) attention core.

The kernel instead packs G = floor(128/S) segments into one 128-row MXU
tile and computes softmax(QK^T)V for ALL packed segments with two
full-tile matmuls per head plus a static block-diagonal mask — trading a
few extra (masked-out) FLOPs for perfect tiling and zero transposed
intermediates. Everything between the qkv GEMM and the output projection
fuses into one VMEM-resident pass.

Mask correctness: rows attend only within their segment (row//S == col//S);
padding rows (when the segment count isn't a multiple of G) are garbage-in/
garbage-out and sliced off by the caller.

Reference behavior being accelerated: forward_with_scale
(/root/reference/models/multiscale_attn.py:149-166), AttentionForScale /
AttentionForPatch (/root/reference/models/scale_attention.py:28-45,
180-211).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _interpret() -> bool:
    """Run the kernel in interpreter mode off-TPU. Env override
    DUOFORMER_PALLAS_INTERPRET=0/1 (needed where computations are placed on
    CPU while a TPU backend is still the process default)."""
    env = os.environ.get("DUOFORMER_PALLAS_INTERPRET")
    if env is not None:
        return env == "1"
    return jax.default_backend() != "tpu"


def _segments_per_tile(seg_len: int, n_seg: int = 0) -> int:
    """Segments packed per row-tile (G, with G*seg_len <= 128).

    Prefer the largest G <= 128//S that DIVIDES n_seg: a non-dividing G
    forces a pad-concat that copies the entire qkv tensor (~350MB per
    block at B=256) before every kernel call. A slightly smaller tile
    (e.g. 16x6=96 rows instead of 21x6=126) is cheaper than that copy."""
    g_max = max(1, LANES // seg_len)
    if n_seg:
        for g in range(g_max, 0, -1):
            if n_seg % g == 0:
                # only worth shrinking moderately; below ~half fill the
                # MXU row waste outweighs the copy
                if g * seg_len * 2 >= g_max * seg_len:
                    return g
                break
    return g_max


def _kernel(qkv_ref, out_ref, *, num_heads, seg_len, groups, scale,
            tiles_per_step):
    """One grid step: `tiles_per_step` row-tiles of `groups` segments x
    seg_len tokens, all heads.

    qkv_ref: [T, groups*seg_len, 3*C] VMEM; out_ref: [T, groups*seg_len, C].
    (3-D blocks whose trailing dims equal the array dims — Mosaic requires
    block dims divisible by (8, 128) OR equal to the array's; rows like
    126 = 21 segments x 6 tokens satisfy only the latter. T > 1 amortizes
    per-grid-step pipeline overhead, which dominates at these tiny tiles.)
    """
    rows = groups * seg_len
    C = out_ref.shape[-1]
    D = C // num_heads

    # static block-diagonal mask: additive 0 within segment, -inf across
    row_seg = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0) // seg_len
    col_seg = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1) // seg_len
    neg_inf = jnp.float32(-1e30)
    mask = jnp.where(row_seg == col_seg, 0.0, neg_inf)

    # NOTE: a batched-heads dot_general variant (heads as a batch dim of
    # one matmul) was tried and REJECTED: Mosaic cannot lane-split
    # vector<rows x C> -> vector<rows x H x D> in-kernel
    # ("infer-vector-layout: unsupported shape cast" on v5e). The per-head
    # loop's 64-lane slices are the supported formulation.
    for t in range(tiles_per_step):
        qkv = qkv_ref[t]                       # [rows, 3C]
        for h in range(num_heads):
            q = qkv[:, h * D:(h + 1) * D]
            k = qkv[:, C + h * D:C + (h + 1) * D]
            v = qkv[:, 2 * C + h * D:2 * C + (h + 1) * D]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # [rows, rows]
            s = s * scale + mask
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            o = jnp.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)  # [rows, D]
            out_ref[t, :, h * D:(h + 1) * D] = o.astype(out_ref.dtype)


def _tiles_per_step(rows: int, threeC: int, itemsize: int) -> int:
    """Row-tiles per grid step. Measured on v5e: T=4 packing was ~15%
    SLOWER than T=1 (coarser granules reduce DMA/compute overlap;
    per-grid-step overhead is not the bottleneck), so this stays 1.
    Override via DUOFORMER_ATTN_TILES for experiments."""
    env = os.environ.get("DUOFORMER_ATTN_TILES")
    if env:
        return max(1, int(env))
    return 1


def _block_attention_impl(qkv, num_heads, seg_len, scale):
    """qkv: [num_segments, seg_len, 3C] -> [num_segments, seg_len, C]."""
    n_seg, S, threeC = qkv.shape
    assert S == seg_len
    C = threeC // 3
    G = _segments_per_tile(seg_len, n_seg)
    rows = G * S
    T = _tiles_per_step(rows, threeC, qkv.dtype.itemsize)
    n_pad = (-n_seg) % (G * T)
    if n_pad:
        qkv = jnp.concatenate(
            [qkv, jnp.zeros((n_pad, S, threeC), qkv.dtype)], axis=0)
    n_tiles = (n_seg + n_pad) // G

    tiled = qkv.reshape(n_tiles, rows, threeC)
    kern = functools.partial(_kernel, num_heads=num_heads, seg_len=seg_len,
                             groups=G, scale=scale, tiles_per_step=T)
    out = pl.pallas_call(
        kern,
        grid=(n_tiles // T,),
        in_specs=[pl.BlockSpec((T, rows, threeC), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, rows, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, rows, C), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n_tiles * num_heads * rows * rows * (C // num_heads),
            bytes_accessed=n_tiles * rows * (3 * C + C) * qkv.dtype.itemsize,
            transcendentals=n_tiles * num_heads * rows * rows,
        ),
        interpret=_interpret(),
    )(tiled)
    out = out.reshape(n_tiles * G, S, C)
    return out[:n_seg] if n_pad else out


def _xla_reference(qkv, num_heads, seg_len, scale):
    """Pure-XLA equivalent (used for the custom-vjp backward and tests)."""
    n_seg, S, threeC = qkv.shape
    C = threeC // 3
    D = C // num_heads
    qkv = qkv.reshape(n_seg, S, 3, num_heads, D)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]   # [n, S, H, D]
    s = jnp.einsum("nshd,nthd->nhst", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("nhst,nthd->nshd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32).astype(qkv.dtype)
    return o.reshape(n_seg, S, C)


# ---------------------------------------------------------------------------
# Fused attention-residual megakernel:
#   y = x + proj( block_diag_attention( qkv_linear( LN(x) ) ) )
# i.e. the entire attention branch of a pre-norm block in ONE VMEM-resident
# pass. Eliminates the HBM materialization of LN(x), the 3C-wide qkv
# activation (the big one: ~350MB/block at B=256), the attention output,
# and the proj input. The MLP half of the block stays in XLA (pure GEMMs
# already at ~90% peak).
# ---------------------------------------------------------------------------

ATTN_SUBTILES = 5   # attention sub-tiles per grid step (VMEM-budgeted)


def _fused_block_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                        wproj_ref, bproj_ref, out_ref, qkv_scratch,
                        *, num_heads, seg_len, groups, scale, ln_eps,
                        use_ln=True, use_residual=True):
    R = x_ref.shape[1]                 # rows per grid step
    C = x_ref.shape[2]
    D = C // num_heads
    arows = groups * seg_len           # rows per attention sub-tile

    x = x_ref[0]                                        # [R, C] bf16
    xf = x.astype(jnp.float32)
    if use_ln:
        # LayerNorm (f32 stats in-register)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        ln = (xf - mean) * jax.lax.rsqrt(var + ln_eps)
        ln = (ln * lns_ref[0].astype(jnp.float32)
              + lnb_ref[0].astype(jnp.float32)).astype(x.dtype)
    else:
        ln = x

    # qkv GEMM into VMEM scratch
    qkv_scratch[:] = (jax.lax.dot_general(
        ln, wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)   # [R, 3C]

    # block-diag mask for one attention sub-tile
    row_seg = jax.lax.broadcasted_iota(jnp.int32, (arows, arows), 0) // seg_len
    col_seg = jax.lax.broadcasted_iota(jnp.int32, (arows, arows), 1) // seg_len
    mask = jnp.where(row_seg == col_seg, 0.0, jnp.float32(-1e30))

    # attention per sub-tile, writing the merged heads back over scratch cols [0, C)
    for sub in range(R // arows):
        lo = sub * arows
        qkv = qkv_scratch[lo:lo + arows, :]
        for h in range(num_heads):
            q = qkv[:, h * D:(h + 1) * D]
            k = qkv[:, C + h * D:C + (h + 1) * D]
            v = qkv[:, 2 * C + h * D:2 * C + (h + 1) * D]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s * scale + mask
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            o = jnp.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
            qkv_scratch[lo:lo + arows, h * D:(h + 1) * D] = o.astype(x.dtype)

    # output projection (+ residual for pre-norm blocks)
    attn = qkv_scratch[:, :C]
    y = jax.lax.dot_general(attn, wproj_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + bproj_ref[0].astype(jnp.float32)
    if use_residual:
        y = y + xf
    out_ref[0] = y.astype(out_ref.dtype)


def _fused_block_impl(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                      num_heads, seg_len, scale, ln_eps,
                      use_ln=True, use_residual=True):
    """x: [n_seg, seg_len, C] -> same shape; the attention residual branch."""
    n_seg, S, C = x.shape
    G = _segments_per_tile(seg_len, n_seg)
    arows = G * S
    # pack ATTN_SUBTILES attention tiles per grid step when they divide evenly
    T = ATTN_SUBTILES
    while T > 1 and (n_seg // G) % T != 0:
        T -= 1
    R = arows * T
    n_pad = (-n_seg) % (G * T)
    if n_pad:
        x = jnp.concatenate([x, jnp.zeros((n_pad, S, C), x.dtype)], axis=0)
    n_steps = (n_seg + n_pad) // (G * T)

    tiled = x.reshape(n_steps, R, C)
    kern = functools.partial(
        _fused_block_kernel, num_heads=num_heads, seg_len=seg_len,
        groups=G, scale=scale, ln_eps=ln_eps, use_ln=use_ln,
        use_residual=use_residual)
    out = pl.pallas_call(
        kern,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, R, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_steps, R, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((R, 3 * C), x.dtype)],
        interpret=_interpret(),
    )(tiled, ln_scale.reshape(1, C), ln_bias.reshape(1, C),
      wqkv, bqkv.reshape(1, 3 * C), wproj, bproj.reshape(1, C))
    out = out.reshape(-1, S, C)
    return out[:n_seg] if n_pad else out


def _fused_block_xla(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                     num_heads, seg_len, scale, ln_eps,
                     use_ln=True, use_residual=True):
    """XLA reference composition (tests + custom-vjp backward)."""
    xf = x.astype(jnp.float32)
    if use_ln:
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        ln = (xf - mean) * jax.lax.rsqrt(var + ln_eps)
        ln = (ln * ln_scale.astype(jnp.float32)
              + ln_bias.astype(jnp.float32)).astype(x.dtype)
    else:
        ln = x
    qkv = (jnp.dot(ln, wqkv.astype(x.dtype),
                   preferred_element_type=jnp.float32)
           + bqkv.astype(jnp.float32)).astype(x.dtype)
    attn = _xla_reference(qkv, num_heads, seg_len, scale)
    y = (jnp.dot(attn, wproj.astype(x.dtype),
                 preferred_element_type=jnp.float32)
         + bproj.astype(jnp.float32))
    if use_residual:
        y = y + xf
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def fused_attention_residual(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                             num_heads, seg_len, scale, ln_eps=1e-6,
                             use_ln=True, use_residual=True):
    """y = [x +] proj(block_diag_attn(qkv([LN](x)))) fused in one kernel.

    x: [num_segments, seg_len, C]. Weights in this framework's layouts
    (linear (in, out)). use_ln/use_residual=False give the bare-attention
    form of the reference's PatchBlock / region pass. Backward recomputes
    via the XLA composition."""
    return _fused_block_impl(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                             num_heads, seg_len, scale, ln_eps,
                             use_ln, use_residual)


def _far_fwd(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
             num_heads, seg_len, scale, ln_eps, use_ln, use_residual):
    out = _fused_block_impl(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                            num_heads, seg_len, scale, ln_eps,
                            use_ln, use_residual)
    return out, (x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj)


def _far_bwd(num_heads, seg_len, scale, ln_eps, use_ln, use_residual, res, g):
    _, vjp = jax.vjp(
        lambda *a: _fused_block_xla(*a, num_heads, seg_len, scale, ln_eps,
                                    use_ln, use_residual),
        *res)
    return vjp(g)


fused_attention_residual.defvjp(_far_fwd, _far_bwd)


# ---------------------------------------------------------------------------
# Fused MLP-residual megakernel: y = x + fc2(gelu(fc1(LN(x))))
# Eliminates the block's largest activation — the 4C-wide MLP hidden
# (~460MB/block at B=256, C=768) — plus the LN2 materialization.
# ---------------------------------------------------------------------------

MLP_ROW_TILE = 256


def _erf_poly(x):
    """Abramowitz-Stegun 7.1.26 erf (max abs err 1.5e-7 — below bf16
    resolution). Mosaic lowers neither erf nor erfc; exp it has."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    y = 1.0 - ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t * jnp.exp(-ax * ax)
    return s * y


def _fused_mlp_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                      b2_ref, out_ref, hid_scratch, *, ln_eps):
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    ln = (xf - mean) * jax.lax.rsqrt(var + ln_eps)
    ln = ln * lns_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    h = jax.lax.dot_general(ln.astype(x.dtype), w1_ref[:],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[0].astype(jnp.float32)
    # exact-GELU via polynomial erf (see _erf_poly)
    h = 0.5 * h * (1.0 + _erf_poly(h * 0.7071067811865476))
    hid_scratch[:] = h.astype(x.dtype)
    y = jax.lax.dot_general(hid_scratch[:], w2_ref[:],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + b2_ref[0].astype(jnp.float32) + xf
    out_ref[:] = y.astype(out_ref.dtype)


def _fused_mlp_impl(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps):
    *lead, C = x.shape
    hidden = w1.shape[-1]
    n = 1
    for d in lead:
        n *= d
    flat = x.reshape(n, C)
    rt = MLP_ROW_TILE
    n_pad = (-n) % rt
    if n_pad:
        flat = jnp.concatenate([flat, jnp.zeros((n_pad, C), flat.dtype)],
                               axis=0)
    rows = flat.shape[0]
    out = pl.pallas_call(
        functools.partial(_fused_mlp_kernel, ln_eps=ln_eps),
        grid=(rows // rt,),
        in_specs=[
            pl.BlockSpec((rt, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rt, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((rt, hidden), x.dtype)],
        interpret=_interpret(),
    )(flat, ln_scale.reshape(1, C), ln_bias.reshape(1, C), w1,
      b1.reshape(1, hidden), w2, b2.reshape(1, C))
    if n_pad:
        out = out[:n]
    return out.reshape(*lead, C)


def _rowquant(v):
    """Per-row symmetric int8 quantization (in-kernel). v: [R, C] f32."""
    amax = jnp.max(jnp.abs(v), axis=-1, keepdims=True)
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jax.lax.round(v / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


def _fused_mlp_int8_kernel(x_ref, lns_ref, lnb_ref, w1_ref, s1_ref, b1_ref,
                           w2_ref, s2_ref, b2_ref, out_ref, *, ln_eps):
    """a8w8 variant: both GEMMs run int8 x int8 -> int32 on the MXU (2x
    bf16 throughput on v5e); dequant is an outer product of the dynamic
    per-row activation scale and the static per-channel weight scale."""
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    ln = (xf - mean) * jax.lax.rsqrt(var + ln_eps)
    ln = ln * lns_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)

    lq, ls = _rowquant(ln)
    acc = jax.lax.dot_general(lq, w1_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    h = acc.astype(jnp.float32) * ls * s1_ref[0] + b1_ref[0].astype(jnp.float32)
    h = 0.5 * h * (1.0 + _erf_poly(h * 0.7071067811865476))

    hq, hs = _rowquant(h)
    acc2 = jax.lax.dot_general(hq, w2_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    y = acc2.astype(jnp.float32) * hs * s2_ref[0] + b2_ref[0].astype(jnp.float32)
    out_ref[:] = (y + xf).astype(out_ref.dtype)


def fused_mlp_residual_int8(x, ln_scale, ln_bias, w1_q, s1, b1, w2_q, s2, b2,
                            ln_eps=1e-6):
    """int8 serving form of fused_mlp_residual (inference only — no vjp)."""
    *lead, C = x.shape
    hidden = w1_q.shape[-1]
    n = 1
    for d in lead:
        n *= d
    flat = x.reshape(n, C)
    rt = MLP_ROW_TILE
    n_pad = (-n) % rt
    if n_pad:
        flat = jnp.concatenate([flat, jnp.zeros((n_pad, C), flat.dtype)],
                               axis=0)
    rows = flat.shape[0]
    out = pl.pallas_call(
        functools.partial(_fused_mlp_int8_kernel, ln_eps=ln_eps),
        grid=(rows // rt,),
        in_specs=[
            pl.BlockSpec((rt, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rt, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, C), x.dtype),
        interpret=_interpret(),
    )(flat, ln_scale.reshape(1, C), ln_bias.reshape(1, C), w1_q,
      s1.reshape(1, hidden), b1.reshape(1, hidden), w2_q,
      s2.reshape(1, C), b2.reshape(1, C))
    if n_pad:
        out = out[:n]
    return out.reshape(*lead, C)


def _fused_mlp_xla(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    ln = (xf - mean) * jax.lax.rsqrt(var + ln_eps)
    ln = (ln * ln_scale.astype(jnp.float32)
          + ln_bias.astype(jnp.float32)).astype(x.dtype)
    h = jnp.dot(ln, w1.astype(x.dtype),
                preferred_element_type=jnp.float32) + b1.astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=False).astype(x.dtype)
    y = (jnp.dot(h, w2.astype(x.dtype), preferred_element_type=jnp.float32)
         + b2.astype(jnp.float32) + xf)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_mlp_residual(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps=1e-6):
    """y = x + fc2(gelu(fc1(LN(x)))) fused in one kernel. x: [..., C]."""
    return _fused_mlp_impl(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps)


def _fmr_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps):
    out = _fused_mlp_impl(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2)


def _fmr_bwd(ln_eps, res, g):
    _, vjp = jax.vjp(lambda *a: _fused_mlp_xla(*a, ln_eps), *res)
    return vjp(g)


fused_mlp_residual.defvjp(_fmr_fwd, _fmr_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def block_diag_attention(qkv, num_heads, seg_len, scale):
    """Fused attention over independent fixed-length segments.

    qkv: [num_segments, seg_len, 3*C] (projection output, torch qkv
    layout: [q | k | v] each C wide, heads contiguous within each).
    Differentiable: forward runs the Pallas kernel, backward the XLA
    reference vjp (recompute-from-qkv).
    """
    return _block_attention_impl(qkv, num_heads, seg_len, scale)


def _fwd(qkv, num_heads, seg_len, scale):
    return _block_attention_impl(qkv, num_heads, seg_len, scale), qkv


def _bwd(num_heads, seg_len, scale, qkv, g):
    _, vjp = jax.vjp(
        lambda t: _xla_reference(t, num_heads, seg_len, scale), qkv)
    return vjp(g)


block_diag_attention.defvjp(_fwd, _bwd)
