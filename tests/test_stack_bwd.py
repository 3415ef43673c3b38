"""Scanned-forward / unrolled-backward stack (ops/stack_bwd.py) parity.

The unrolled backward must be numerically identical to the scan path —
same kernels, same per-block backward math (_fused_block_bwd_impl /
_fmr_bwd_saved_hidden), only the autodiff schedule differs. Verified in
interpret mode on CPU at small lane-aligned shapes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from duoformer_tcga_tpu.models import transformer as tfm


DEPTH, NSEG, S, C, H = 3, 8, 6, 128, 4


def _stacked_params(key):
    return tfm.stack_init(tfm.scale_block_init, key, DEPTH, C, H,
                          dtype=jnp.float32)


def _apply_scan(params, x):
    scale_apply = functools.partial(
        tfm.scale_block_apply, num_heads=H, scale=None, ln_eps=1e-6,
        attn_drop=0.0, proj_drop=0.0, mlp_drop=0.0,
        apply_qk_norm=False, train=True)
    return tfm._scan_blocks(scale_apply, params, x, None, True, DEPTH)


def _apply_unrolled(params, x):
    return tfm._apply_stack_unrolled_bwd(params, x, H, 1e-6)


@pytest.fixture()
def fused_env(monkeypatch):
    monkeypatch.setenv("DUOFORMER_FUSED_ATTN", "1")  # kernels on CPU interpret


def test_forward_matches_scan(fused_env, rng):
    params = _stacked_params(rng)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, S, C), jnp.float32)
    a = _apply_scan(params, x)
    b = _apply_unrolled(params, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)


def test_grads_match_scan(fused_env, rng):
    params = _stacked_params(rng)
    x = jax.random.normal(jax.random.PRNGKey(2), (NSEG, S, C), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(3), (NSEG, S, C), jnp.float32)

    def loss(apply, p, x):
        return jnp.sum(apply(p, x) * g)

    la, (gpa, gxa) = jax.value_and_grad(
        functools.partial(loss, _apply_scan), argnums=(0, 1))(params, x)
    lb, (gpb, gxb) = jax.value_and_grad(
        functools.partial(loss, _apply_unrolled), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gxa), np.asarray(gxb),
                               rtol=1e-5, atol=1e-5)
    flat_a = jax.tree.leaves_with_path(gpa)
    flat_b = {jax.tree_util.keystr(k): v
              for k, v in jax.tree.leaves_with_path(gpb)}
    for k, va in flat_a:
        ks = jax.tree_util.keystr(k)
        vb = flat_b[ks]
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=1e-5, atol=1e-5, err_msg=ks)


def test_model_level_dispatch(fused_env, rng, monkeypatch):
    """MultiscaleFormer grads with the knob on vs off are identical (the
    flagship release config is eligible; the knob only changes schedule)."""
    model = tfm.MultiscaleFormer(depth=DEPTH, scales=2, num_heads=H,
                                 embed_dim=C, num_classes=3,
                                 dtype=jnp.float32)
    params = model.init(rng)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 49, 6, C), jnp.float32)

    def loss(p):
        return jnp.sum(model.apply(p, x, train=True) ** 2)

    monkeypatch.setenv("DUOFORMER_UNROLL_BWD", "0")
    l0, g0 = jax.value_and_grad(loss)(params)
    monkeypatch.setenv("DUOFORMER_UNROLL_BWD", "1")
    l1, g1 = jax.value_and_grad(loss)(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for (k, a), (_, b) in zip(jax.tree.leaves_with_path(g0),
                              jax.tree.leaves_with_path(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(k))


@pytest.mark.parametrize("group", ["1", "2", "4"])
def test_grouped_bwd_matches_full_unroll(fused_env, rng, monkeypatch, group):
    """DUOFORMER_UNROLL_BWD_GROUP < depth takes the reverse-scan-over-
    groups backward; grads must match the fully-unrolled backward."""
    monkeypatch.setenv("DUOFORMER_UNROLL_BWD_GROUP", "8")
    params = tfm.stack_init(tfm.scale_block_init, rng, 4, C, H,
                            dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(5), (NSEG, S, C), jnp.float32)

    def loss(p, x):
        return jnp.sum(_apply_unrolled(p, x) ** 2)

    gp_full, gx_full = jax.grad(loss, argnums=(0, 1))(params, x)
    monkeypatch.setenv("DUOFORMER_UNROLL_BWD_GROUP", group)
    gp_g, gx_g = jax.grad(loss, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx_full), np.asarray(gx_g),
                               rtol=1e-5, atol=1e-5)
    for (k, a), (_, b) in zip(jax.tree.leaves_with_path(gp_full),
                              jax.tree.leaves_with_path(gp_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(k))


def test_ineligible_configs_fall_back(monkeypatch):
    """Reg features (LayerScale), remat, dropout, or fused-off keep the
    scan path — _use_unrolled_bwd must say no."""
    monkeypatch.setenv("DUOFORMER_FUSED_ATTN", "1")
    monkeypatch.setenv("DUOFORMER_UNROLL_BWD", "1")
    key = jax.random.PRNGKey(0)
    plain = tfm.stack_init(tfm.scale_block_init, key, 2, C, H,
                           dtype=jnp.float32)
    ls = tfm.stack_init(tfm.scale_block_init, key, 2, C, H,
                        init_values=1e-5, dtype=jnp.float32)
    assert tfm._use_unrolled_bwd(plain, True, 0.0, False, C, H)
    assert not tfm._use_unrolled_bwd(ls, True, 0.0, False, C, H)
    assert not tfm._use_unrolled_bwd(plain, True, 0.1, False, C, H)
    assert not tfm._use_unrolled_bwd(plain, True, 0.0, True, C, H)
    assert not tfm._use_unrolled_bwd(plain, True, 0.0, False, 96, H)
    monkeypatch.setenv("DUOFORMER_UNROLL_BWD", "0")
    assert not tfm._use_unrolled_bwd(plain, True, 0.0, False, C, H)
    monkeypatch.delenv("DUOFORMER_UNROLL_BWD")
    # default is OFF (AOT compile service rejects the unrolled backward)
    assert not tfm._use_unrolled_bwd(plain, True, 0.0, False, C, H)
    monkeypatch.setenv("DUOFORMER_UNROLL_BWD", "1")
    monkeypatch.setenv("DUOFORMER_FUSED_ATTN", "0")
    assert not tfm._use_unrolled_bwd(plain, True, 0.0, False, C, H)
