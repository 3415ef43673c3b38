"""BN folding: folded inference params must reproduce unfolded logits."""

import numpy as np

import jax
import jax.numpy as jnp

import duoformer_tcga_tpu as dft
from duoformer_tcga_tpu.models.duoformer import fold_for_inference
from duoformer_tcga_tpu.models.resnet import ResNetBackbone, fold_bn


def test_backbone_fold_exact():
    bb = ResNetBackbone(18)
    params = bb.init(jax.random.PRNGKey(0))
    # non-trivial BN stats
    params = jax.tree.map(
        lambda a: a + 0.1 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape)
        / max(a.size, 1), params)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 224, 224, 3))
    ref = bb.apply(params, x)
    out = bb.apply(fold_bn(params), x)
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=1e-3, rtol=1e-3)


def test_full_model_fold_channel_token():
    model = dft.build_model_no_extra_params(
        num_classes=2, num_layers=2, embed_dim=96, proj_dim=96,
        num_heads=12, depth=1, scale_token="channel", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 224, 224, 3))
    ref = model.apply(params, x)
    out = model.apply(fold_for_inference(params), x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
