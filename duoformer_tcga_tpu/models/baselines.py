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
        self.backbone_name = "r18"   # plan_train_memory's activation term
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

    def apply(self, params, x, rng=None, train=False, bn_stats=None):
        """bn_stats: optional mutable dict — with train=True the r18 BNs
        run on batch statistics and their momentum-updated running stats
        land under bn_stats["backbone"] (merge with train.merge_bn_stats;
        make_train_step(bn_stats=True) does). Without it, train-mode BN
        uses batch stats but running stats never move — eval would see
        the init stats, so the CLI always threads this for hybrid."""
        collect = {} if bn_stats is not None and train else None
        feats = self.resnet.apply(params["backbone"], x, train=train,
                                  stats=collect)
        if collect:
            bn_stats["backbone"] = collect
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
    """ViT/ R50-ViT hybrid baseline wrapper (model.py:415-446).

    model_type mirrors the reference:
      * 'ViT'               — plain ViT-B/16 from scratch (model.py:418-419)
      * 'ViTPretrained' /
        'R50ViTPretrained'  — timm `vit_base_r50_s16_224_in21k`: ResNetV2
        (3,4,9) stem -> 14x14 grid -> ViT-B (model.py:420-428)
      * 'R50ViT'            — timm
        `vit_small_r26_s32_224.augreg_in21k_ft_in1k`: ResNetV2 (2,2,2,2)
        stem -> 7x7 grid -> ViT-S/384/6 heads (model.py:430-438)

    The timm-pretrained weights themselves need network egress; here the
    structures build from scratch and `utils.torch_convert.convert_timm_hybrid`
    loads a timm hybrid state_dict when one is provided locally."""

    def __init__(self, n_classes=100, model_type="ViT", dtype=jnp.float32):
        from .resnetv2 import HybridViT

        self.name = model_type
        if model_type == "ViT":
            self.vit = VisionTransformer(patch_size=16, depth=12,
                                         embed_dim=768, num_heads=12,
                                         num_classes=n_classes, dtype=dtype)
            self.hybrid = None
        elif model_type in ("ViTPretrained", "R50ViTPretrained"):
            self.hybrid = HybridViT(layers=(3, 4, 9), embed_dim=768,
                                    depth=12, num_heads=12,
                                    num_classes=n_classes, dtype=dtype)
        elif model_type == "R50ViT":
            self.hybrid = HybridViT(layers=(2, 2, 2, 2), embed_dim=384,
                                    depth=12, num_heads=6,
                                    num_classes=n_classes, dtype=dtype)
        else:
            raise ValueError(f"unknown ViTBase16 model_type: {model_type}")

    def init(self, key):
        if self.hybrid is not None:
            return {"model": self.hybrid.init(key)}
        return {"model": self.vit.init(key)}

    def apply(self, params, x, rng=None, train=False):
        if self.hybrid is not None:
            return self.hybrid.apply(params["model"], x, rng, train)
        return self.vit.apply(params["model"], x, rng, train)
