"""Unit tests for ops/nn.py and ops/attention.py against torch oracles.

torch (CPU) is the test oracle: each primitive is checked against the
equivalent torch.nn op with shared weights. This stands in for the
reference's timm/torch stack (not installed here) — the reference modules
are compositions of exactly these primitives.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from duoformer_tcga_tpu.ops import attention as attn_ops
from duoformer_tcga_tpu.ops import nn


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def assert_close(jx, tt, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(np.asarray(jx), tt.detach().numpy(),
                               atol=atol, rtol=rtol)


class TestLinear:
    def test_matches_torch(self):
        torch.manual_seed(0)
        lin = torch.nn.Linear(32, 64)
        x = torch.randn(4, 7, 32)
        params = {"w": t2j(lin.weight.T), "b": t2j(lin.bias)}
        assert_close(nn.linear(params, t2j(x)), lin(x))


class TestLayerNorm:
    @pytest.mark.parametrize("eps", [1e-5, 1e-6])
    def test_matches_torch(self, eps):
        torch.manual_seed(1)
        ln = torch.nn.LayerNorm(48, eps=eps)
        with torch.no_grad():
            ln.weight.normal_()
            ln.bias.normal_()
        x = torch.randn(3, 5, 48)
        params = {"scale": t2j(ln.weight), "bias": t2j(ln.bias)}
        assert_close(nn.layernorm(params, t2j(x), eps=eps), ln(x))


class TestConv:
    @pytest.mark.parametrize("stride,pad,k", [(1, 0, 1), (2, 1, 3), (2, 3, 7)])
    def test_matches_torch(self, stride, pad, k):
        torch.manual_seed(2)
        conv = torch.nn.Conv2d(8, 16, k, stride=stride, padding=pad)
        x = torch.randn(2, 8, 28, 28)
        # OIHW -> HWIO
        params = {"w": t2j(conv.weight.permute(2, 3, 1, 0)), "b": t2j(conv.bias)}
        y = nn.conv2d(params, t2j(x.permute(0, 2, 3, 1)), stride=stride,
                      padding="VALID" if pad == 0 else pad)
        assert_close(jnp.transpose(y, (0, 3, 1, 2)), conv(x), atol=1e-4)


class TestBatchNorm:
    def test_inference_matches_torch(self):
        torch.manual_seed(3)
        bn = torch.nn.BatchNorm2d(12).eval()
        with torch.no_grad():
            bn.weight.normal_()
            bn.bias.normal_()
            bn.running_mean.normal_()
            bn.running_var.uniform_(0.5, 2.0)
        x = torch.randn(2, 12, 9, 9)
        params = {"scale": t2j(bn.weight), "bias": t2j(bn.bias),
                  "mean": t2j(bn.running_mean), "var": t2j(bn.running_var)}
        y = nn.batchnorm(params, t2j(x.permute(0, 2, 3, 1)))
        assert_close(jnp.transpose(y, (0, 3, 1, 2)), bn(x), atol=1e-5)

    def test_train_mode_matches_torch(self):
        torch.manual_seed(4)
        bn = torch.nn.BatchNorm2d(6).train()
        x = torch.randn(4, 6, 5, 5)
        params = {"scale": t2j(bn.weight), "bias": t2j(bn.bias),
                  "mean": t2j(bn.running_mean), "var": t2j(bn.running_var)}
        y = nn.batchnorm(params, t2j(x.permute(0, 2, 3, 1)), train=True)
        assert_close(jnp.transpose(y, (0, 3, 1, 2)), bn(x), atol=1e-5)

    def test_fold_matches_inference(self):
        key = jax.random.PRNGKey(0)
        params = {"scale": jax.random.normal(key, (8,)),
                  "bias": jnp.ones((8,)),
                  "mean": jnp.full((8,), 0.3),
                  "var": jnp.full((8,), 1.7)}
        x = jax.random.normal(key, (2, 4, 4, 8))
        folded = nn.fold_batchnorm(params)
        np.testing.assert_allclose(np.asarray(nn.affine(folded, x)),
                                   np.asarray(nn.batchnorm(params, x)),
                                   atol=1e-6)


class TestPoolActs:
    def test_maxpool_matches_torch(self):
        torch.manual_seed(5)
        x = torch.randn(2, 3, 14, 14)
        y = nn.maxpool2d(t2j(x.permute(0, 2, 3, 1)), 2, 2)
        assert_close(jnp.transpose(y, (0, 3, 1, 2)), F.max_pool2d(x, 2, 2))

    def test_maxpool_padded_matches_torch(self):
        # the resnet stem pool: 3x3 stride 2 pad 1
        torch.manual_seed(6)
        x = torch.randn(2, 4, 112, 112)
        y = nn.maxpool2d(t2j(x.permute(0, 2, 3, 1)), 3, 2, padding=1)
        assert_close(jnp.transpose(y, (0, 3, 1, 2)),
                     F.max_pool2d(x, 3, 2, padding=1))

    def test_gelu_exact(self):
        x = torch.linspace(-4, 4, 101)
        assert_close(nn.gelu(t2j(x)), F.gelu(x), atol=1e-6)

    def test_global_avgpool(self):
        torch.manual_seed(7)
        x = torch.randn(2, 5, 7, 7)
        y = nn.avgpool_global(t2j(x.permute(0, 2, 3, 1)))
        assert_close(y, x.mean(dim=(2, 3)), atol=1e-6)


class TestMlp:
    def test_matches_torch(self):
        torch.manual_seed(8)
        fc1 = torch.nn.Linear(16, 64)
        fc2 = torch.nn.Linear(64, 16)
        x = torch.randn(3, 16)
        params = {"fc1": {"w": t2j(fc1.weight.T), "b": t2j(fc1.bias)},
                  "fc2": {"w": t2j(fc2.weight.T), "b": t2j(fc2.bias)}}
        ref = fc2(F.gelu(fc1(x)))
        assert_close(nn.mlp(params, t2j(x)), ref, atol=1e-5)


def torch_mhsa(x, qkv, proj, num_heads, scale):
    """Oracle reproducing the reference attention math
    (multiscale_attn.py:149-166 / scale_attention.py:28-45) with torch.nn."""
    *lead, S, C = x.shape
    D = C // num_heads
    h = qkv(x).reshape(*lead, S, 3, num_heads, D)
    h = h.permute(*range(len(lead) - 0), *[len(lead) + i for i in (1, 2, 0, 3)]) \
        if False else h
    # explicit: move (3, H) out front like torch's .permute in the reference
    h = torch.movedim(h, -3, 0)          # [3, ..., S, H, D]
    h = torch.movedim(h, -2, -3)         # [3, ..., H, S, D]
    q, k, v = h[0], h[1], h[2]
    attn = (q @ k.transpose(-2, -1)) * scale
    attn = attn.softmax(dim=-1)
    out = attn @ v                        # [..., H, S, D]
    out = torch.movedim(out, -3, -2).reshape(*lead, S, C)
    return proj(out)


class TestAttention:
    @pytest.mark.parametrize("lead,S,C,H", [((2, 49), 6, 96, 12),
                                            ((2,), 50, 96, 12),
                                            ((3, 7), 86, 64, 8)])
    def test_matches_torch_oracle(self, lead, S, C, H):
        torch.manual_seed(9)
        qkv = torch.nn.Linear(C, 3 * C)
        proj = torch.nn.Linear(C, C)
        x = torch.randn(*lead, S, C)
        params = {"qkv": {"w": t2j(qkv.weight.T), "b": t2j(qkv.bias)},
                  "proj": {"w": t2j(proj.weight.T), "b": t2j(proj.bias)}}
        scale = (C // H) ** -0.5
        y = attn_ops.multihead_attention(params, t2j(x), H, scale=scale)
        assert_close(y, torch_mhsa(x, qkv, proj, H, scale), atol=1e-5)

    def test_quirk_scale_factor(self):
        """Q12: the legacy variant uses 2*dim**-0.5, not head_dim**-0.5."""
        torch.manual_seed(10)
        C, H = 96, 12
        qkv = torch.nn.Linear(C, 3 * C)
        proj = torch.nn.Linear(C, C)
        x = torch.randn(2, 10, C)
        params = {"qkv": {"w": t2j(qkv.weight.T), "b": t2j(qkv.bias)},
                  "proj": {"w": t2j(proj.weight.T), "b": t2j(proj.bias)}}
        scale = 2 * C ** -0.5
        y = attn_ops.multihead_attention(params, t2j(x), H, scale=scale)
        assert_close(y, torch_mhsa(x, qkv, proj, H, scale), atol=1e-5)


def test_mlp_train_without_rng_skips_dropout():
    """rng=None in train mode must behave like nn.dropout (skip), not
    crash in jax.random.split — the XLA block path passes rng=None when
    the caller trains without a dropout key."""
    params = nn.mlp_init(jax.random.PRNGKey(0), 16, 32)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16))
    out = nn.mlp(params, x, drop=0.1, rng=None, train=True)
    ref = nn.mlp(params, x, drop=0.0, rng=None, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_s2d_stem_exact():
    """The space-to-depth stem transform (DUOFORMER_S2D_STEM) is an EXACT
    re-expression of the 7x7/stride-2/pad-3 stem conv: front-padded 8x8
    kernel rearranged to 4x4 over (2,2,C) space-to-depth channels, pad
    (2,1) — forward and weight-grad identical to float rounding."""
    from duoformer_tcga_tpu.models import resnet as rn

    p = {"w": jax.random.normal(jax.random.PRNGKey(0), (7, 7, 3, 64),
                                jnp.float32) * 0.05}
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 224, 224, 3))
    a = nn.conv2d(p, x, 2, 3)
    b = rn._stem_conv_s2d(p, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)
    ga = jax.grad(lambda w: jnp.sum(jnp.sin(nn.conv2d({"w": w}, x, 2, 3))))(
        p["w"])
    gb = jax.grad(
        lambda w: jnp.sum(jnp.sin(rn._stem_conv_s2d({"w": w}, x))))(p["w"])
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               atol=5e-4, rtol=5e-4)


def test_s2d_stem_backbone_parity(monkeypatch):
    """Backbone pyramid with the s2d stem == without, on a small input."""
    from duoformer_tcga_tpu.models.resnet import ResNetBackbone

    bb = ResNetBackbone(50, jnp.float32)
    params = bb.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    monkeypatch.setenv("DUOFORMER_S2D_STEM", "0")
    ref = bb.apply(params, x)
    monkeypatch.setenv("DUOFORMER_S2D_STEM", "1")
    got = bb.apply(params, x)
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=2e-4, rtol=2e-4)
