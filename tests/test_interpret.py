"""Attention-map extraction (models/interpret.py): the diagnostic forward
must agree with the production forward bitwise-close, and the maps must be
well-formed probability rows. The reference exposes no attention maps at
all — this is new framework capability for pathology interpretability."""

import numpy as np

import pytest

import jax
import jax.numpy as jnp

from duoformer_tcga_tpu.models import interpret
from duoformer_tcga_tpu.models.duoformer import DuoFormer, DuoFormerLegacy


def _tiny(scale_token="random", patch_attn=True, depth=2):
    return DuoFormer(depth=depth, embed_dim=96, num_heads=12, num_classes=3,
                     num_layers=2, proj_dim=96, scale_token=scale_token,
                     patch_attn=patch_attn, dtype=jnp.float32)


def _x(b=2):
    return jax.random.normal(jax.random.PRNGKey(1), (b, 224, 224, 3),
                             jnp.float32)


@pytest.mark.parametrize("scale_token", ["random", "channel"])
def test_logits_match_production_forward(scale_token):
    m = _tiny(scale_token)
    p = m.init(jax.random.PRNGKey(0))
    x = _x()
    ref = np.asarray(m.apply(p, x, train=False))
    out, maps = jax.jit(lambda p, x: interpret.attention_maps(m, p, x))(p, x)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)
    assert set(maps) == {"scale_attn", "patch_attn", "region_rollout"}


def test_maps_are_probability_rows():
    m = _tiny()
    p = m.init(jax.random.PRNGKey(0))
    _, maps = interpret.attention_maps(m, p, _x())
    s = np.asarray(maps["scale_attn"])          # [B, depth, 49, S+1]
    assert s.shape == (2, 2, 49, 6)
    np.testing.assert_allclose(s.sum(-1), np.ones((2, 2, 49)), atol=1e-5)
    assert (s >= 0).all()
    pa = np.asarray(maps["patch_attn"])         # [B, depth, 50]
    assert pa.shape == (2, 2, 50)
    np.testing.assert_allclose(pa.sum(-1), np.ones((2, 2)), atol=1e-5)
    r = np.asarray(maps["region_rollout"])      # [B, 49]
    assert r.shape == (2, 49)
    np.testing.assert_allclose(r.sum(-1), np.ones((2,)), atol=1e-5)
    assert (r >= 0).all()


def test_rollout_single_block_equals_cls_row():
    """With depth=1 the rollout IS the (renormalized) single CLS row —
    pins the chaining order."""
    m = _tiny(depth=1)
    p = m.init(jax.random.PRNGKey(0))
    _, maps = interpret.attention_maps(m, p, _x())
    row = np.asarray(maps["patch_attn"])[:, 0, 1:]
    row = row / row.sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(maps["region_rollout"]), row,
                               atol=1e-6)


def test_no_patch_attn_variant():
    m = _tiny(patch_attn=False)
    p = m.init(jax.random.PRNGKey(0))
    ref = np.asarray(m.apply(p, _x(), train=False))
    out, maps = interpret.attention_maps(m, p, _x())
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)
    assert set(maps) == {"scale_attn"}


def test_legacy_family_maps():
    m = DuoFormerLegacy(depth=2, embed_dim=96, num_heads=12, num_classes=2,
                        proj_dim=96, dtype=jnp.float32)
    p = m.init(jax.random.PRNGKey(0))
    x = _x()
    ref = np.asarray(m.apply(p, x, train=False))
    out, maps = interpret.attention_maps(m, p, x)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)
    # Q4 region pass: exactly blocks {0, depth-1} contribute
    assert np.asarray(maps["patch_attn"]).shape == (2, 2, 50)
    np.testing.assert_allclose(
        np.asarray(maps["region_rollout"]).sum(-1), np.ones((2,)), atol=1e-5)


def test_region_grid():
    r = jnp.arange(2 * 49, dtype=jnp.float32).reshape(2, 49)
    g = np.asarray(interpret.region_grid(r))
    assert g.shape == (2, 7, 7)
    assert g[1, 3, 2] == 49 + 3 * 7 + 2     # row-major


def test_predictor_attention_maps():
    from duoformer_tcga_tpu.inference import Predictor

    m = _tiny()
    p = m.init(jax.random.PRNGKey(0))
    pred = Predictor(m, p, dtype=jnp.float32)
    tiles = np.random.default_rng(0).integers(
        0, 256, (2, 224, 224, 3), np.uint8)
    logits, maps = pred.attention_maps(tiles)
    assert np.asarray(logits).shape == (2, 3)
    assert np.asarray(maps["region_rollout"]).shape == (2, 49)
    # the diagnostic forward sees the SAME folded params as serving
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(pred(tiles)).astype(np.float32),
                               atol=1e-5, rtol=1e-5)


def test_predictor_attention_maps_rejects_int8():
    from duoformer_tcga_tpu.inference import Predictor

    m = _tiny()
    p = m.init(jax.random.PRNGKey(0))
    pred = Predictor(m, p, dtype=jnp.float32, quantize=True)
    with pytest.raises(ValueError, match="bf16"):
        pred.attention_maps(np.zeros((2, 224, 224, 3), np.uint8))


def test_non_duoformer_raises():
    from duoformer_tcga_tpu.models.baselines import ViTBase16

    m = ViTBase16(n_classes=2, dtype=jnp.float32)
    with pytest.raises(ValueError, match="families"):
        interpret.attention_maps(m, {}, _x())


def test_three_scale_maps():
    """Maps generalize across the variant matrix: 3 scales -> S+1 = 22
    tokens per region (num_scale_tokens)."""
    m = DuoFormer(depth=1, embed_dim=96, num_heads=12, num_classes=2,
                  num_layers=3, proj_dim=96, dtype=jnp.float32)
    p = m.init(jax.random.PRNGKey(0))
    x = _x()
    ref = np.asarray(m.apply(p, x, train=False))
    out, maps = interpret.attention_maps(m, p, x)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)
    s = np.asarray(maps["scale_attn"])
    assert s.shape == (2, 1, 49, 22)
    np.testing.assert_allclose(s.sum(-1), np.ones((2, 1, 49)), atol=1e-5)
