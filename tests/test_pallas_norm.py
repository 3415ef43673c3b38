"""Fused LayerNorm kernel vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from duoformer_tcga_tpu.ops import pallas_norm as pn


@pytest.mark.parametrize("shape", [(75264, 768), (3, 49, 6, 128),
                                   (100, 256), (7, 128)])
def test_matches_torch(shape):
    torch.manual_seed(0)
    C = shape[-1]
    ln = torch.nn.LayerNorm(C, eps=1e-6)
    with torch.no_grad():
        ln.weight.normal_()
        ln.bias.normal_()
    x = torch.randn(*shape)
    ref = ln(x).detach().numpy()
    out = pn.fused_layernorm(jnp.asarray(x.numpy()),
                             jnp.asarray(ln.weight.detach().numpy()),
                             jnp.asarray(ln.bias.detach().numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


def test_gradient_matches_reference():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (64, 128))
    s = jax.random.normal(jax.random.PRNGKey(1), (128,))
    b = jax.random.normal(jax.random.PRNGKey(2), (128,))

    g1 = jax.grad(lambda x, s, b: pn.fused_layernorm(x, s, b).sum(),
                  argnums=(0, 1, 2))(x, s, b)
    g2 = jax.grad(lambda x, s, b: pn._xla_reference(x, s, b, 1e-6).sum(),
                  argnums=(0, 1, 2))(x, s, b)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-5, rtol=1e-5)


def test_nn_layernorm_routes_to_fused(monkeypatch):
    from duoformer_tcga_tpu.ops import nn

    monkeypatch.setenv("DUOFORMER_FUSED_LN", "1")
    params = {"scale": jnp.ones((128,)), "bias": jnp.zeros((128,))}
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 128))
    out = nn.layernorm(params, x)
    monkeypatch.setenv("DUOFORMER_FUSED_LN", "0")
    ref = nn.layernorm(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_non_aligned_dim_falls_back():
    params = {"scale": jnp.ones((96,)), "bias": jnp.zeros((96,))}
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 96))
    assert not pn.use_fused_ln(x)
