"""r50_Swav (SSL pathology backbone) model path."""

import jax
import jax.numpy as jnp

import duoformer_tcga_tpu as dft


def test_ssl_backbone_variant_builds_and_runs():
    model = dft.build_model_no_extra_params(
        num_classes=2, num_layers=2, embed_dim=96, proj_dim=96,
        num_heads=12, depth=1, backbone="r50_Swav", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    # same trunk shape as r50 (Bottleneck [3,4,6,3]); pyramid taps identical
    assert len(params["backbone"]["layer3"]) == 6
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 224, 224, 3))
    out = jax.jit(lambda p, v: model.apply(p, v))(params, x)
    assert out.shape == (1, 2)
