"""Fused block-diagonal attention kernel vs the XLA reference (interpret
mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from duoformer_tcga_tpu.ops import attention as attn_ops
from duoformer_tcga_tpu.ops import pallas_attention as pa


@pytest.mark.parametrize("n_seg,S,C,H", [
    (98, 6, 96, 12),     # 2-scale: 21 segments/tile with padding
    (21, 6, 96, 12),     # exact tile
    (5, 86, 96, 8),      # 4-scale: 1 segment/tile (86 rows)
    (7, 22, 96, 4),      # 3-scale
    (4, 50, 96, 12),     # patch attention shape
    (3, 2, 96, 12),      # 1-scale
])
def test_matches_xla_reference(n_seg, S, C, H):
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (n_seg, S, 3 * C), jnp.float32)
    scale = (C // H) ** -0.5
    ref = pa._xla_reference(qkv, H, S, scale)
    out = pa.block_diag_attention(qkv, H, S, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_gradient_matches_reference():
    key = jax.random.PRNGKey(1)
    qkv = jax.random.normal(key, (10, 6, 3 * 48), jnp.float32)
    scale = 0.25

    def loss_fused(t):
        return pa.block_diag_attention(t, 4, 6, scale).sum()

    def loss_ref(t):
        return pa._xla_reference(t, 4, 6, scale).sum()

    g1 = jax.grad(loss_fused)(qkv)
    g2 = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-5, rtol=1e-5)


def test_multihead_attention_fused_matches_unfused():
    key = jax.random.PRNGKey(2)
    C, H = 96, 12
    params = attn_ops.attention_init(key, C, H)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 49, 6, C))
    ref = attn_ops.multihead_attention(params, x, H, fused=False)
    out = attn_ops.multihead_attention(params, x, H, fused=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_mask_blocks_cross_segment_leakage():
    """Changing segment j must not affect segment i != j."""
    key = jax.random.PRNGKey(4)
    qkv = jax.random.normal(key, (8, 6, 3 * 48), jnp.float32)
    out1 = pa.block_diag_attention(qkv, 4, 6, 0.2)
    qkv2 = qkv.at[3].add(100.0)
    out2 = pa.block_diag_attention(qkv2, 4, 6, 0.2)
    np.testing.assert_array_equal(np.asarray(out1[:3]), np.asarray(out2[:3]))
    np.testing.assert_array_equal(np.asarray(out1[4:]), np.asarray(out2[4:]))
    assert np.abs(np.asarray(out1[3] - out2[3])).max() > 0


class TestMegakernel:
    @pytest.mark.parametrize("n_seg,S,C,H", [(98, 6, 128, 8), (32, 6, 256, 8),
                                             (4, 50, 128, 4)])
    def test_fused_attention_residual_matches_xla(self, n_seg, S, C, H):
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 8)
        x = jax.random.normal(ks[0], (n_seg, S, C), jnp.float32)
        lns = jax.random.normal(ks[1], (C,)) * 0.1 + 1.0
        lnb = jax.random.normal(ks[2], (C,)) * 0.1
        wqkv = jax.random.normal(ks[3], (C, 3 * C)) * 0.02
        bqkv = jax.random.normal(ks[4], (3 * C,)) * 0.01
        wproj = jax.random.normal(ks[5], (C, C)) * 0.02
        bproj = jax.random.normal(ks[6], (C,)) * 0.01
        scale = (C // H) ** -0.5
        ref = pa._fused_block_xla(x, lns, lnb, wqkv, bqkv, wproj, bproj,
                                  H, S, scale, 1e-6)
        out = pa.fused_attention_residual(x, lns, lnb, wqkv, bqkv, wproj,
                                          bproj, H, S, scale, 1e-6)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5, rtol=3e-5)

    def test_megakernel_gradient(self):
        key = jax.random.PRNGKey(1)
        ks = jax.random.split(key, 8)
        C, S, H = 128, 6, 8
        x = jax.random.normal(ks[0], (21, S, C))
        args = [jnp.ones((C,)), jnp.zeros((C,)),
                jax.random.normal(ks[3], (C, 3 * C)) * 0.02,
                jnp.zeros((3 * C,)),
                jax.random.normal(ks[5], (C, C)) * 0.02, jnp.zeros((C,))]
        scale = (C // H) ** -0.5

        g1 = jax.grad(lambda v: pa.fused_attention_residual(
            v, *args, H, S, scale, 1e-6).sum())(x)
        g2 = jax.grad(lambda v: pa._fused_block_xla(
            v, *args, H, S, scale, 1e-6).sum())(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=2e-5, rtol=2e-5)

    def test_scale_block_megafused_matches_plain(self, monkeypatch):
        from duoformer_tcga_tpu.models.transformer import (
            scale_block_apply, scale_block_init)

        params = scale_block_init(jax.random.PRNGKey(0), 128, 8)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 49, 6, 128))
        monkeypatch.setenv("DUOFORMER_MEGAFUSE", "1")
        out = scale_block_apply(params, x, 8)
        monkeypatch.setenv("DUOFORMER_MEGAFUSE", "0")
        monkeypatch.setenv("DUOFORMER_FUSED_ATTN", "0")
        ref = scale_block_apply(params, x, 8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5, rtol=3e-5)

    def test_fused_mlp_residual_matches_xla(self):
        key = jax.random.PRNGKey(2)
        ks = jax.random.split(key, 8)
        C, H4 = 128, 512
        x = jax.random.normal(ks[0], (37, 6, C))
        lns = jax.random.normal(ks[1], (C,)) * 0.1 + 1.0
        lnb = jax.random.normal(ks[2], (C,)) * 0.1
        w1 = jax.random.normal(ks[3], (C, H4)) * 0.02
        b1 = jax.random.normal(ks[4], (H4,)) * 0.01
        w2 = jax.random.normal(ks[5], (H4, C)) * 0.02
        b2 = jax.random.normal(ks[6], (C,)) * 0.01
        ref = pa._fused_mlp_xla(x, lns, lnb, w1, b1, w2, b2, 1e-6)
        out = pa.fused_mlp_residual(x, lns, lnb, w1, b1, w2, b2, 1e-6)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5, rtol=3e-5)
        # gradient
        g1 = jax.grad(lambda v: pa.fused_mlp_residual(
            v, lns, lnb, w1, b1, w2, b2, 1e-6).sum())(x)
        g2 = jax.grad(lambda v: pa._fused_mlp_xla(
            v, lns, lnb, w1, b1, w2, b2, 1e-6).sum())(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=2e-5, rtol=2e-5)

    @pytest.mark.parametrize("hp", [2, 4])
    def test_headpack_matches_per_head(self, hp, monkeypatch):
        """DUOFORMER_ATTN_HEADPACK packs P heads' QK^T/PV into single
        dot_generals over zero-padded block-diagonal K/V operands — the
        cross-head products are exact zeros, so the packed core must match
        the per-head loop bit-for-bit (measured 0.0 on silicon)."""
        key = jax.random.PRNGKey(5)
        ks = jax.random.split(key, 8)
        n_seg, S, C, H = 96, 6, 128, 8
        x = jax.random.normal(ks[0], (n_seg, S, C), jnp.float32)
        args = [jax.random.normal(ks[1], (C,)) * 0.1 + 1.0,
                jax.random.normal(ks[2], (C,)) * 0.1,
                jax.random.normal(ks[3], (C, 3 * C)) * 0.02,
                jax.random.normal(ks[4], (3 * C,)) * 0.01,
                jax.random.normal(ks[5], (C, C)) * 0.02,
                jax.random.normal(ks[6], (C,)) * 0.01]
        scale = (C // H) ** -0.5
        monkeypatch.delenv("DUOFORMER_ATTN_HEADPACK", raising=False)
        ref = pa.fused_attention_residual(x, *args, H, S, scale, 1e-6)
        monkeypatch.setenv("DUOFORMER_ATTN_HEADPACK", str(hp))
        out = pa.fused_attention_residual(x, *args, H, S, scale, 1e-6)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6, rtol=1e-6)
