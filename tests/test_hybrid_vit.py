"""R50/R26-ViT hybrid baselines (VERDICT r1 Missing #2): the timm
ResNetV2-stem hybrids the reference's ViTBase16 wraps
(/root/reference/models/model.py:418-441). Parity is proven by loading a
synthetic timm-layout hybrid state_dict through convert_timm_hybrid and
matching logits against the torch oracle (StdConv2dSame + GroupNorm +
TF-SAME padding + post-act bottlenecks).
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from duoformer_tcga_tpu.models.baselines import ViTBase16
from duoformer_tcga_tpu.models.resnetv2 import HybridViT, ResNetV2Trunk
from duoformer_tcga_tpu.utils import torch_convert as tc

from torch_oracle import OracleResNetV2Trunk, OracleTimmHybridViT


def _parity(layers, embed_dim, depth, num_heads, img):
    torch.manual_seed(21)
    oracle = OracleTimmHybridViT(layers=layers, embed_dim=embed_dim,
                                 depth=depth, num_heads=num_heads,
                                 num_classes=3, img_size=img)
    oracle.eval()
    model = HybridViT(layers=layers, embed_dim=embed_dim, depth=depth,
                      num_heads=num_heads, num_classes=3, img_size=img)
    sd = oracle.state_dict()

    class _Shim:           # convert_timm_hybrid reads model.hybrid
        hybrid = model
    params = tc.to_jax(tc.convert_timm_hybrid(sd, _Shim))["model"]

    torch.manual_seed(22)
    x = torch.randn(2, 3, img, img)
    with torch.no_grad():
        ref = oracle(x).numpy()
    out = np.asarray(model.apply(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_resnetv2_trunk_parity():
    """StdConv + GroupNorm + SAME padding trunk alone, odd input size so
    the asymmetric TF-SAME pads are exercised."""
    torch.manual_seed(23)
    trunk_t = OracleResNetV2Trunk(layers=(1, 1))
    trunk_t.eval()
    trunk = ResNetV2Trunk(layers=(1, 1))
    params = tc.to_jax(tc.convert_resnetv2(trunk_t.state_dict(), (1, 1)))
    x = torch.randn(2, 3, 72, 72)
    with torch.no_grad():
        ref = trunk_t(x).numpy().transpose(0, 2, 3, 1)
    out = np.asarray(trunk.apply(params, jnp.asarray(
        x.numpy().transpose(0, 2, 3, 1))))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_r50_s16_hybrid_parity_small():
    """R50-s16 architecture (layers (3,4,9), post-act V2 bottlenecks) at
    reduced width/depth — structure identical, sizes test-friendly."""
    _parity(layers=(3, 4, 9), embed_dim=384, depth=2, num_heads=6, img=96)


def test_r26_s32_hybrid_parity_small():
    """R26-s32 architecture (layers (2,2,2,2)) as in
    vit_small_r26_s32_224."""
    _parity(layers=(2, 2, 2, 2), embed_dim=384, depth=2, num_heads=6, img=64)


def test_vitbase16_hybrid_types_build_and_run():
    """The reference's model_type surface: hybrid types construct the right
    grids and run end-to-end at 224**2."""
    m = ViTBase16(n_classes=5, model_type="R50ViTPretrained")
    assert m.hybrid.grid == 14 and m.hybrid.num_patches == 196
    assert m.hybrid.trunk.out_channels == 1024
    m2 = ViTBase16(n_classes=5, model_type="R50ViT")
    assert m2.hybrid.grid == 7 and m2.hybrid.trunk.out_channels == 2048
    assert m2.hybrid.vit.embed_dim == 384

    params = m2.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 224, 224, 3))
    out = m2.apply(params, x)
    assert out.shape == (1, 5)


def test_hybrid_converted_tree_matches_init_tree():
    """Converted timm state_dict and init() agree on tree structure."""
    model = ViTBase16(n_classes=3, model_type="R50ViT")
    oracle = OracleTimmHybridViT(layers=(2, 2, 2, 2), embed_dim=384,
                                 depth=12, num_heads=6, num_classes=3)
    conv = tc.to_jax(tc.convert_timm_hybrid(oracle.state_dict(), model))
    t1 = jax.tree_util.tree_structure(model.init(jax.random.PRNGKey(0)))
    t2 = jax.tree_util.tree_structure(conv)
    assert t1 == t2
