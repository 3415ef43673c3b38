"""Backward-megakernel gradient parity (VERDICT r1 item #3).

The fused backward kernels recompute LN/qkv/softmax/GELU in VMEM and emit
row-space intermediates for the XLA weight-grad GEMMs. These tests check
every cotangent against jax.vjp over the XLA composition (the previous
backward path), in interpret mode on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from duoformer_tcga_tpu.ops import pallas_attention as pa


def _grads(fn, args, g):
    out, vjp = jax.vjp(fn, *args)
    return out, vjp(g)


def _attn_args(key, n_seg, S, C, dtype):
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (n_seg, S, C), dtype)
    lns = 1.0 + 0.1 * jax.random.normal(ks[1], (C,), dtype)
    lnb = 0.1 * jax.random.normal(ks[2], (C,), dtype)
    wqkv = jax.random.normal(ks[3], (C, 3 * C), dtype) * 0.05
    bqkv = 0.1 * jax.random.normal(ks[4], (3 * C,), dtype)
    wproj = jax.random.normal(ks[5], (C, C), dtype) * 0.05
    bproj = 0.1 * jax.random.normal(ks[6], (C,), dtype)
    g = jax.random.normal(ks[7], (n_seg, S, C), dtype)
    return (x, lns, lnb, wqkv, bqkv, wproj, bproj), g


@pytest.mark.parametrize("use_ln,use_residual", [(True, True), (False, False)])
@pytest.mark.parametrize("n_seg,S", [(98, 6), (20, 50)])
def test_attention_residual_backward_parity(use_ln, use_residual, n_seg, S,
                                            monkeypatch):
    C, H = 128, 8
    args, g = _attn_args(jax.random.PRNGKey(0), n_seg, S, C, jnp.float32)
    scale = (C // H) ** -0.5

    def kernel_fn(*a):
        return pa.fused_attention_residual(*a, H, S, scale, 1e-6,
                                           use_ln, use_residual)

    def xla_fn(*a):
        return pa._fused_block_xla(*a, H, S, scale, 1e-6,
                                   use_ln, use_residual)

    monkeypatch.setenv("DUOFORMER_PALLAS_BWD", "1")
    out_k, grads_k = _grads(kernel_fn, args, g)
    out_x, grads_x = _grads(xla_fn, args, g)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               atol=1e-5, rtol=1e-5)
    names = ["dx", "dln_scale", "dln_bias", "dwqkv", "dbqkv", "dwproj",
             "dbproj"]
    for name, gk, gx in zip(names, grads_k, grads_x):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gx), atol=2e-4, rtol=2e-4,
            err_msg=f"{name} mismatch (use_ln={use_ln})")


def test_attention_residual_backward_env_fallback(monkeypatch):
    """DUOFORMER_PALLAS_BWD=0 must reproduce the XLA-vjp path bit-for-bit."""
    C, H, S = 128, 8, 6
    args, g = _attn_args(jax.random.PRNGKey(1), 42, S, C, jnp.float32)
    scale = (C // H) ** -0.5

    def fn(*a):
        return pa.fused_attention_residual(*a, H, S, scale, 1e-6, True, True)

    monkeypatch.setenv("DUOFORMER_PALLAS_BWD", "0")
    _, g_off = _grads(fn, args, g)
    monkeypatch.setenv("DUOFORMER_PALLAS_BWD", "1")
    _, g_on = _grads(fn, args, g)
    for a, b in zip(g_off, g_on):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_mlp_residual_backward_parity(monkeypatch):
    C, hidden = 128, 512
    ks = jax.random.split(jax.random.PRNGKey(2), 8)
    x = jax.random.normal(ks[0], (3, 70, C))       # non-multiple of row tile
    lns = 1.0 + 0.1 * jax.random.normal(ks[1], (C,))
    lnb = 0.1 * jax.random.normal(ks[2], (C,))
    w1 = jax.random.normal(ks[3], (C, hidden)) * 0.05
    b1 = 0.1 * jax.random.normal(ks[4], (hidden,))
    w2 = jax.random.normal(ks[5], (hidden, C)) * 0.05
    b2 = 0.1 * jax.random.normal(ks[6], (C,))
    g = jax.random.normal(ks[7], (3, 70, C))
    args = (x, lns, lnb, w1, b1, w2, b2)

    monkeypatch.setenv("DUOFORMER_PALLAS_BWD", "1")
    monkeypatch.setenv("DUOFORMER_PALLAS_MLP_BWD", "1")
    out_k, grads_k = _grads(lambda *a: pa.fused_mlp_residual(*a, 1e-6),
                            args, g)
    out_x, grads_x = _grads(lambda *a: pa._fused_mlp_xla(*a, 1e-6), args, g)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               atol=1e-5, rtol=1e-5)
    names = ["dx", "dln_scale", "dln_bias", "dw1", "db1", "dw2", "db2"]
    for name, gk, gx in zip(names, grads_k, grads_x):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gx), atol=3e-4, rtol=3e-4,
            err_msg=f"{name} mismatch")


@pytest.mark.parametrize("use_residual", [True, False])
def test_mlp_residual_saved_hidden_backward_parity(use_residual, monkeypatch):
    """Save-hidden backward (forward kernel emits pre-GELU z; backward
    skips the fc1 recompute) vs the XLA-composition vjp. Rows chosen to
    exercise the kernel row-tile padding."""
    C, hidden = 128, 512
    ks = jax.random.split(jax.random.PRNGKey(3), 8)
    x = jax.random.normal(ks[0], (3, 70, C))       # 210 rows: pads to 256
    lns = 1.0 + 0.1 * jax.random.normal(ks[1], (C,))
    lnb = 0.1 * jax.random.normal(ks[2], (C,))
    w1 = jax.random.normal(ks[3], (C, hidden)) * 0.05
    b1 = 0.1 * jax.random.normal(ks[4], (hidden,))
    w2 = jax.random.normal(ks[5], (hidden, C)) * 0.05
    b2 = 0.1 * jax.random.normal(ks[6], (C,))
    g = jax.random.normal(ks[7], (3, 70, C))
    args = (x, lns, lnb, w1, b1, w2, b2)

    monkeypatch.setenv("DUOFORMER_PALLAS_BWD", "1")
    monkeypatch.setenv("DUOFORMER_MLP_SAVE_HIDDEN", "1")
    out_k, grads_k = _grads(
        lambda *a: pa.fused_mlp_residual(*a, 1e-6, use_residual), args, g)
    out_x, grads_x = _grads(
        lambda *a: pa._fused_mlp_xla(*a, 1e-6, use_residual), args, g)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               atol=1e-5, rtol=1e-5)
    names = ["dx", "dln_scale", "dln_bias", "dw1", "db1", "dw2", "db2"]
    for name, gk, gx in zip(names, grads_k, grads_x):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gx), atol=3e-4, rtol=3e-4,
            err_msg=f"{name} mismatch (use_residual={use_residual})")


@pytest.mark.parametrize("dz,emit_h", [("0", "0"), ("1", "0"), ("1", "1")])
def test_mlp_saved_hidden_dz_kernel_variants(dz, emit_h, monkeypatch):
    """The fused dz kernel (_mlp_dz_kernel: dh GEMM + GELU' + db1
    accumulation, optional h emission) must match the XLA composition in
    every variant. Rows (210) force the kernel's own row-tile padding on
    top of the forward padding."""
    C, hidden = 128, 512
    ks = jax.random.split(jax.random.PRNGKey(7), 8)
    x = jax.random.normal(ks[0], (3, 70, C))
    lns = 1.0 + 0.1 * jax.random.normal(ks[1], (C,))
    lnb = 0.1 * jax.random.normal(ks[2], (C,))
    w1 = jax.random.normal(ks[3], (C, hidden)) * 0.05
    b1 = 0.1 * jax.random.normal(ks[4], (hidden,))
    w2 = jax.random.normal(ks[5], (hidden, C)) * 0.05
    b2 = 0.1 * jax.random.normal(ks[6], (C,))
    g = jax.random.normal(ks[7], (3, 70, C))
    args = (x, lns, lnb, w1, b1, w2, b2)

    monkeypatch.setenv("DUOFORMER_PALLAS_BWD", "1")
    monkeypatch.setenv("DUOFORMER_MLP_SAVE_HIDDEN", "1")
    monkeypatch.setenv("DUOFORMER_MLP_DZ", dz)
    monkeypatch.setenv("DUOFORMER_MLP_DZ_H", emit_h)
    out_k, grads_k = _grads(
        lambda *a: pa.fused_mlp_residual(*a, 1e-6, True), args, g)
    out_x, grads_x = _grads(
        lambda *a: pa._fused_mlp_xla(*a, 1e-6, True), args, g)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               atol=1e-5, rtol=1e-5)
    names = ["dx", "dln_scale", "dln_bias", "dw1", "db1", "dw2", "db2"]
    for name, gk, gx in zip(names, grads_k, grads_x):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gx), atol=3e-4, rtol=3e-4,
            err_msg=f"{name} mismatch (dz={dz}, emit_h={emit_h})")


def test_scale_block_train_grads_through_megakernels(monkeypatch):
    """End-to-end: grads of a scale block (megafused path) vs the
    unfused block composition."""
    from duoformer_tcga_tpu.models.transformer import (scale_block_apply,
                                                       scale_block_init)

    params = scale_block_init(jax.random.PRNGKey(0), 128, 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 49, 6, 128))

    def loss(p, megafuse):
        monkeypatch.setenv("DUOFORMER_MEGAFUSE", "1" if megafuse else "0")
        monkeypatch.setenv("DUOFORMER_FUSED_ATTN", "1" if megafuse else "0")
        return jnp.sum(scale_block_apply(p, x, 8) ** 2)

    monkeypatch.setenv("DUOFORMER_PALLAS_BWD", "1")
    g_fused = jax.grad(lambda p: loss(p, True))(params)
    g_ref = jax.grad(lambda p: loss(p, False))(params)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_fused)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    for (path, a), (_, b) in zip(flat_f, flat_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4,
            err_msg=f"{jax.tree_util.keystr(path)}")


@pytest.mark.parametrize("n_seg,S", [(98, 6), (20, 50)])
def test_attention_backward_dw_in_kernel_parity(n_seg, S, monkeypatch):
    """DUOFORMER_BWD_DW=1 (weight grads accumulated in revisited VMEM
    blocks, no row-space HBM round-trip) must match both the XLA-dW
    kernel path and the pure-XLA vjp on every cotangent."""
    C, H = 128, 8
    args, g = _attn_args(jax.random.PRNGKey(3), n_seg, S, C, jnp.float32)
    scale = (C // H) ** -0.5

    def kernel_fn(*a):
        return pa.fused_attention_residual(*a, H, S, scale, 1e-6,
                                           True, True)

    monkeypatch.setenv("DUOFORMER_PALLAS_BWD", "1")
    monkeypatch.setenv("DUOFORMER_BWD_DW", "1")
    out_dw, grads_dw = _grads(kernel_fn, args, g)
    monkeypatch.setenv("DUOFORMER_BWD_DW", "0")
    out_k, grads_k = _grads(kernel_fn, args, g)
    out_x, grads_x = _grads(
        lambda *a: pa._fused_block_xla(*a, H, S, scale, 1e-6, True, True),
        args, g)
    np.testing.assert_allclose(np.asarray(out_dw), np.asarray(out_k),
                               atol=1e-5, rtol=1e-5)
    names = ["dx", "dln_scale", "dln_bias", "dwqkv", "dbqkv", "dwproj",
             "dbproj"]
    for name, gdw, gk, gx in zip(names, grads_dw, grads_k, grads_x):
        np.testing.assert_allclose(
            np.asarray(gdw), np.asarray(gk), atol=2e-4, rtol=2e-4,
            err_msg=f"{name} dw-vs-kernel mismatch")
        np.testing.assert_allclose(
            np.asarray(gdw), np.asarray(gx), atol=2e-4, rtol=2e-4,
            err_msg=f"{name} dw-vs-xla mismatch")


def test_attention_backward_dw_in_kernel_reg_parity(monkeypatch):
    """The reg megakernel (dropout + LayerScale) under DUOFORMER_BWD_DW=1:
    the in-kernel A = attn^T gm accumulator must reproduce the XLA-side
    gamma identities (dwproj, dgamma, dbproj) exactly."""
    x, lns, lnb, wqkv, bqkv, wproj, bproj, gamma = (
        jax.random.normal(k, s, jnp.float32) * m for k, s, m in zip(
            jax.random.split(jax.random.PRNGKey(4), 8),
            [(52, 6, 128), (128,), (128,), (128, 384), (384,),
             (128, 128), (128,), (128,)],
            [1.0, 0.1, 0.1, 0.05, 0.1, 0.05, 0.1, 0.5]))
    lns, gamma = lns + 1.0, gamma + 0.5
    args = (x, lns, lnb, wqkv, bqkv, wproj, bproj, gamma)
    seed = jnp.int32(777)
    nh, S = 8, 6
    scale = (128 // nh) ** -0.5

    def loss(*a):
        y = pa.fused_attention_residual_reg(*a, seed, nh, S, scale, 1e-6,
                                            True, True, 0.1, 0.15)
        return jnp.sum(y * jnp.sin(0.01 * jnp.arange(
            y.size, dtype=jnp.float32).reshape(y.shape)))

    monkeypatch.setenv("DUOFORMER_PALLAS_BWD", "1")
    monkeypatch.setenv("DUOFORMER_BWD_DW", "1")
    g_dw = jax.grad(loss, argnums=tuple(range(8)))(*args)
    monkeypatch.setenv("DUOFORMER_BWD_DW", "0")
    g_ref = jax.grad(loss, argnums=tuple(range(8)))(*args)
    names = ["x", "lns", "lnb", "wqkv", "bqkv", "wproj", "bproj", "gamma"]
    for n, a, b in zip(names, g_dw, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=n)
