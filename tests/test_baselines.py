"""Baseline model families: shapes, parity of the ViT block math with the
torch oracle, and the HybridModel assembly."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from duoformer_tcga_tpu.models.baselines import HybridModel, ViTBase16
from duoformer_tcga_tpu.models.resnet import ResNet50withFC
from duoformer_tcga_tpu.models.transformer import ScaleFormer
from duoformer_tcga_tpu.models.vit import VisionTransformer


def test_vit_forward_shape():
    vit = VisionTransformer(img_size=224, patch_size=32, embed_dim=96,
                            depth=2, num_heads=12, num_classes=5)
    params = vit.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 224, 224, 3))
    out = jax.jit(lambda p, v: vit.apply(p, v))(params, x)
    assert out.shape == (2, 5)


def test_vit_patch_embed_matches_torch():
    """Patch embed == conv(patch,stride=patch) + flatten (timm PatchEmbed)."""
    torch.manual_seed(0)
    conv = torch.nn.Conv2d(3, 16, 8, stride=8)
    x = torch.randn(2, 3, 32, 32)
    ref = conv(x).flatten(2).transpose(1, 2)   # [B, 16 patches, C]

    vit = VisionTransformer(img_size=32, patch_size=8, embed_dim=16,
                            depth=1, num_heads=2, num_classes=2)
    params = vit.init(jax.random.PRNGKey(0))
    params["patch_embed"] = {
        "w": jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "b": jnp.asarray(conv.bias.detach().numpy()),
    }
    params["pos_embed"] = jnp.zeros_like(params["pos_embed"])
    params["cls_token"] = jnp.zeros_like(params["cls_token"])
    tokens = vit.embed(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(tokens[:, 1:, :]),
                               ref.detach().numpy(), atol=1e-5)


def test_hybrid_model_forward():
    m = HybridModel(num_classes=7, num_blocks=2, proj_dim=96, num_heads=12)
    params = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 224, 224, 3))
    out = jax.jit(lambda p, v: m.apply(p, v))(params, x)
    assert out.shape == (2, 7)


def test_hybrid_model_parity():
    """HybridModel vs torch oracle through the converter."""
    from duoformer_tcga_tpu.utils import torch_convert as tc
    from torch_oracle import OracleHybridModel

    torch.manual_seed(11)
    oracle = OracleHybridModel(num_classes=5, num_blocks=2, proj_dim=96,
                               num_heads=12).eval()
    m = HybridModel(num_classes=5, num_blocks=2, proj_dim=96, num_heads=12)
    params = tc.to_jax(tc.convert_hybrid(oracle.state_dict(), m))
    x = torch.randn(2, 3, 224, 224)
    with torch.no_grad():
        ref = oracle(x).numpy()
    out = m.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_vitbase16_forward():
    m = ViTBase16(n_classes=3)
    # full-size ViT-B/16 is heavy on 1-CPU; just check init structure
    params = m.init(jax.random.PRNGKey(0))
    assert params["model"]["pos_embed"].shape == (1, 197, 768)


def test_vit_full_parity_with_patch_embed():
    """Small ViT (patch embed + blocks + head) vs a torch oracle via
    convert_vit — covers the ViTBase16 weight-loading path."""
    from duoformer_tcga_tpu.utils import torch_convert as tc
    from torch_oracle import OracleScaleBlock

    torch.manual_seed(12)
    C, P, IMG, depth = 64, 8, 32, 2
    n_patches = (IMG // P) ** 2

    class OracleViT(torch.nn.Module):
        def __init__(self):
            super().__init__()
            pe = torch.nn.Module()
            pe.proj = torch.nn.Conv2d(3, C, P, stride=P)
            self.patch_embed = pe
            self.cls_token = torch.nn.Parameter(torch.randn(1, 1, C) * 0.02)
            self.pos_embed = torch.nn.Parameter(
                torch.randn(1, n_patches + 1, C) * 0.02)
            self.blocks = torch.nn.Sequential(
                *[OracleScaleBlock(C, 8) for _ in range(depth)])
            self.norm = torch.nn.LayerNorm(C, eps=1e-6)
            self.head = torch.nn.Linear(C, 3)

        def forward(self, x):
            t = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
            cls = self.cls_token.expand(t.shape[0], -1, -1)
            t = torch.cat([cls, t], dim=1) + self.pos_embed
            for blk in self.blocks:
                t = blk(t)
            return self.head(self.norm(t)[:, 0, :])

    oracle = OracleViT().eval()
    vit = VisionTransformer(img_size=IMG, patch_size=P, embed_dim=C,
                            depth=depth, num_heads=8, num_classes=3)
    params = tc.to_jax(tc.convert_vit(oracle.state_dict(), depth))
    x = torch.randn(2, 3, IMG, IMG)
    with torch.no_grad():
        ref = oracle(x).numpy()
    out = vit.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_resnet50_fc_probe():
    m = ResNet50withFC(num_classes=4)
    params = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 224, 224, 3))
    out = jax.jit(lambda p, v: m.apply(p, v))(params, x)
    assert out.shape == (2, 4)
    # frozen trunk: gradient flows only into fc
    g = jax.grad(lambda p: m.apply(p, x).sum())(params)
    assert all(float(jnp.abs(l).max()) == 0.0
               for l in jax.tree.leaves(g["trunk"]))
    assert float(jnp.abs(g["fc"]["w"]).max()) > 0


def test_scaleformer_cls_at_index_one():
    """Reference extracts the region token at index 1, not 0
    (scale_attention.py:168)."""
    sf = ScaleFormer(depth=1, scales=2, num_heads=4, embed_dim=32)
    params = sf.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 49, 5, 32))
    out = sf.apply(params, x)
    assert out.shape == (2, 49, 32)
