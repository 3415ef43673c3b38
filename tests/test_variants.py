"""Variant-matrix edges: patch_attn=False, scaleformer family, presets."""

import jax
import jax.numpy as jnp

import duoformer_tcga_tpu as dft
from duoformer_tcga_tpu import config as config_lib


def test_patch_attn_false_path():
    """patch_attn=False classifies from mean-pooled region tokens
    (extension; the reference accepts but cannot apply the flag)."""
    m = dft.build_model_no_extra_params(
        num_classes=3, num_layers=2, embed_dim=96, proj_dim=96,
        num_heads=12, depth=1, patch_attn=False, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0))
    # no patch blocks needed for the forward, but params still include them
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 224, 224, 3))
    out = jax.jit(lambda p, v: m.apply(p, v))(params, x)
    assert out.shape == (2, 3)


def test_every_preset_builds():
    for name, mc in config_lib.PRESETS.items():
        model = mc.build()
        assert model is not None, name


def test_scaleformer_family_apply():
    cfg = config_lib.PRESETS["scaleformer-only"]
    import dataclasses
    mc = dataclasses.replace(cfg, depth=1, embed_dim=96, num_heads=12,
                             dtype="float32")
    sf = mc.build()
    params = sf.init(jax.random.PRNGKey(0))
    tokens = jax.random.normal(jax.random.PRNGKey(1), (2, 49, 5, 96))
    out = sf.apply(params, tokens)
    assert out.shape == (2, 49, 96)
