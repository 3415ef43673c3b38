"""Ablation baseline models from the reference's variant matrix (SURVEY §2).

  * HybridModel — frozen-nothing ResNet-18 trunk -> 1x1-conv projection ->
    ViT blocks with the patch embed bypassed
    (/root/reference/models/model.py:344-412, "baseline 2").
  * ViTBase16 — plain ViT or (when weights are provided via the converter)
    pretrained hybrids (model.py:415-446). Network-downloaded timm
    pretrained variants are represented by `pretrained=False` construction
    + load_params from a converted checkpoint; this environment has no
    egress (documented deviation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .projection import Projection
from .resnet import ResNetBackbone
from .vit import VisionTransformer


class HybridModel:
    """ResNet-18 (stage-4 features) + projection + ViT-minus-patch-embed.

    Uses the ViT's own pos_embed/cls (49 patches => patch_size 32 at 224²,
    matching the reference's VisionTransformer(patch_size=32), model.py:356-358).
    """

    def __init__(self, num_classes=100, num_blocks=12, proj_dim=768,
                 num_heads=12, dtype=jnp.float32):
        self.num_classes = num_classes
        self.proj_dim = proj_dim
        self.dtype = dtype
        self.resnet = ResNetBackbone(18, dtype)
        self.projection = Projection(1, proj_dim, "r18", dtype)
        self.vit = VisionTransformer(patch_size=32, depth=num_blocks,
                                     embed_dim=proj_dim, num_heads=num_heads,
                                     num_classes=num_classes, dtype=dtype)

    def init(self, key):
        kb, kp, kv = jax.random.split(key, 3)
        return {
            "backbone": self.resnet.init(kb),
            "projection": self.projection.init(kp),
            "vit": self.vit.init(kv),
        }

    def apply(self, params, x, rng=None, train=False):
        feats = self.resnet.apply(params["backbone"], x, train=train)
        y = self.projection.apply(params["projection"], {"3": feats["3"]})["3"]
        B = y.shape[0]
        tokens = y.reshape(B, 49, self.proj_dim)     # flatten(2).T, model.py:375
        cls = jnp.broadcast_to(params["vit"]["cls_token"].astype(tokens.dtype),
                               (B, 1, self.proj_dim))
        tokens = jnp.concatenate([cls, tokens], axis=1)
        tokens = tokens + params["vit"]["pos_embed"].astype(tokens.dtype)
        tokens = self.vit.forward_tokens(params["vit"], tokens, rng, train)
        return self.vit.forward_head(params["vit"], tokens)


class ViTBase16:
    """Plain-ViT baseline wrapper (model.py:415-446). model_type='ViT'
    builds from scratch; the reference's timm-pretrained types map to
    loading converted weights into the same structure."""

    def __init__(self, n_classes=100, model_type="ViT", dtype=jnp.float32):
        self.name = model_type
        self.vit = VisionTransformer(patch_size=16, depth=12, embed_dim=768,
                                     num_heads=12, num_classes=n_classes,
                                     dtype=dtype)

    def init(self, key):
        return {"model": self.vit.init(key)}

    def apply(self, params, x, rng=None, train=False):
        return self.vit.apply(params["model"], x, rng, train)
