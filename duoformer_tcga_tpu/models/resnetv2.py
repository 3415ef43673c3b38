"""ResNetV2 hybrid trunk — the stem of the timm R50-ViT / R26-ViT hybrids.

The reference's `ViTBase16` wraps timm's `vit_base_r50_s16_224_in21k`
("ViTPretrained"/"R50ViTPretrained") and
`vit_small_r26_s32_224.augreg_in21k_ft_in1k` ("R50ViT")
(/root/reference/models/model.py:418-441). Those models embed patches with
a BiT-style ResNetV2: weight-standardized convolutions (StdConv2dSame,
eps 1e-8), GroupNorm(32) + ReLU, TF-'SAME' padding, POST-activation
bottlenecks (timm `_resnetv2(..., preact=False, stem_type='same')` in
vision_transformer_hybrid.py), stage strides (1, 2, 2, ...):

  * R50-s16: layers (3, 4, 9)   -> stride-16 feature map 14x14 x 1024
  * R26-s32: layers (2, 2, 2, 2) -> stride-32 feature map  7x7 x 2048

Parameter tree mirrors the timm state_dict structure
(stem.conv / stem.norm / stages.{s}.blocks.{b}.{conv1..3,norm1..3,
downsample.{conv,norm}}) so the converter is a rename+transpose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import initializers as init
from ..ops import nn

GN_GROUPS = 32


def _gn_relu(p, x):
    return nn.relu(nn.groupnorm(p, x, groups=GN_GROUPS))


def _bottleneck_v2_init(key, cin, mid, cout, stride, dtype):
    ks = jax.random.split(key, 4)
    p = {
        "conv1": {"w": init.kaiming_normal_conv_fan_out(ks[0], (1, 1, cin, mid), dtype)},
        "norm1": nn.groupnorm_init(mid, dtype),
        "conv2": {"w": init.kaiming_normal_conv_fan_out(ks[1], (3, 3, mid, mid), dtype)},
        "norm2": nn.groupnorm_init(mid, dtype),
        "conv3": {"w": init.kaiming_normal_conv_fan_out(ks[2], (1, 1, mid, cout), dtype)},
        "norm3": nn.groupnorm_init(cout, dtype),
    }
    if stride != 1 or cin != cout:
        p["downsample"] = {
            "conv": {"w": init.kaiming_normal_conv_fan_out(
                ks[3], (1, 1, cin, cout), dtype)},
            "norm": nn.groupnorm_init(cout, dtype),
        }
    return p


def _bottleneck_v2_apply(p, x, stride):
    """timm resnetv2.Bottleneck (preact=False): conv-GN-ReLU x2,
    conv-GN (no act), shortcut conv-GN, ReLU after the add."""
    shortcut = x
    if "downsample" in p:
        shortcut = nn.stdconv2d(p["downsample"]["conv"], x, stride, "SAME")
        shortcut = nn.groupnorm(p["downsample"]["norm"], shortcut,
                                groups=GN_GROUPS)
    y = _gn_relu(p["norm1"], nn.stdconv2d(p["conv1"], x, 1, "SAME"))
    y = _gn_relu(p["norm2"], nn.stdconv2d(p["conv2"], y, stride, "SAME"))
    y = nn.groupnorm(p["norm3"], nn.stdconv2d(p["conv3"], y, 1, "SAME"),
                     groups=GN_GROUPS)
    return nn.relu(y + shortcut)


class ResNetV2Trunk:
    """BiT-style trunk returning the final stride-16/32 feature map."""

    def __init__(self, layers=(3, 4, 9), width_factor=1, dtype=jnp.float32):
        self.layers = tuple(layers)
        self.dtype = dtype
        base = [256, 512, 1024, 2048]
        self.stage_out = [c * width_factor for c in base[:len(self.layers)]]
        self.out_channels = self.stage_out[-1]

    def init(self, key):
        kstem, *kstages = jax.random.split(key, 1 + len(self.layers))
        p = {
            "stem": {
                "conv": {"w": init.kaiming_normal_conv_fan_out(
                    kstem, (7, 7, 3, 64), self.dtype)},
                "norm": nn.groupnorm_init(64, self.dtype),
            }
        }
        cin = 64
        stages = []
        for si, (nblocks, cout) in enumerate(zip(self.layers, self.stage_out)):
            mid = cout // 4
            blocks = []
            for bi in range(nblocks):
                kb = jax.random.fold_in(kstages[si], bi)
                stride = 2 if (si > 0 and bi == 0) else 1
                blocks.append(_bottleneck_v2_init(kb, cin, mid, cout, stride,
                                                  self.dtype))
                cin = cout
            stages.append({"blocks": blocks})
        p["stages"] = stages
        return p

    def apply(self, params, x):
        """x: [B, 224, 224, 3] -> [B, 224/s, 224/s, out_channels]."""
        y = nn.stdconv2d(params["stem"]["conv"], x, 2, "SAME")
        y = _gn_relu(params["stem"]["norm"], y)
        y = nn.maxpool2d(y, window=3, stride=2, padding="SAME")
        for si, stage in enumerate(params["stages"]):
            for bi, blk in enumerate(stage["blocks"]):
                stride = 2 if (si > 0 and bi == 0) else 1
                y = _bottleneck_v2_apply(blk, y, stride)
        return y


class HybridViT:
    """ResNetV2 trunk -> 1x1 patch-projection -> standard ViT. The timm
    R50/R26 hybrid architecture (vision_transformer_hybrid.py HybridEmbed:
    backbone feature map, conv proj, flatten; then cls + pos_embed +
    blocks + norm + head)."""

    def __init__(self, layers=(3, 4, 9), embed_dim=768, depth=12,
                 num_heads=12, num_classes=100, img_size=224,
                 dtype=jnp.float32):
        from .vit import VisionTransformer

        self.trunk = ResNetV2Trunk(layers, dtype=dtype)
        # effective stride: stem /4, then /2 per stage after the first
        stride = 4 * 2 ** (len(layers) - 1)
        self.grid = img_size // stride
        self.num_patches = self.grid ** 2
        self.embed_dim = embed_dim
        self.dtype = dtype
        self.vit = VisionTransformer(
            img_size=img_size, patch_size=img_size // self.grid,
            embed_dim=embed_dim, depth=depth, num_heads=num_heads,
            num_classes=num_classes, dtype=dtype)

    def init(self, key):
        kb, kp, kv = jax.random.split(key, 3)
        vit_params = self.vit.init(kv)
        vit_params["patch_embed"] = nn.conv_init(
            kp, 1, 1, self.trunk.out_channels, self.embed_dim,
            scheme="torch", dtype=self.dtype)
        return {"backbone": self.trunk.init(kb), "vit": vit_params}

    def apply(self, params, x, rng=None, train=False):
        feats = self.trunk.apply(params["backbone"], x)       # [B,g,g,C_bb]
        y = nn.conv2d(params["vit"]["patch_embed"], feats, 1, "VALID")
        B = y.shape[0]
        tokens = y.reshape(B, self.num_patches, self.embed_dim)
        cls = jnp.broadcast_to(
            params["vit"]["cls_token"].astype(tokens.dtype),
            (B, 1, self.embed_dim))
        tokens = jnp.concatenate([cls, tokens], axis=1)
        tokens = tokens + params["vit"]["pos_embed"].astype(tokens.dtype)
        tokens = self.vit.forward_tokens(params["vit"], tokens, rng, train)
        return self.vit.forward_head(params["vit"], tokens)
