"""Projection heads and channel/scale-token builders.

Behavioral twins of /root/reference/models/projection_head.py, NHWC:
  * Projection      — per-stage 1x1 convs to a common proj_dim
    (projection_head.py:11-149); kaiming_normal weights, bias normal(1e-6).
  * ChannelProjectors — downsample every pyramid stage to 7x7, concat
    channels (r50: 256+512+1024+2048=3840), fuse through 4 conv-BN-ReLU
    layers to proj_dim, yielding one derived "channel" scale token per
    region (projection_head.py:152-268).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import nn

# Per-backbone stage channel widths (torchvision resnet50/resnet18 pyramids).
STAGE_CHANNELS = {
    "r50": {"0": 256, "1": 512, "2": 1024, "3": 2048},
    "r50_Swav": {"0": 256, "1": 512, "2": 1024, "3": 2048},
    "r18": {"0": 64, "1": 128, "2": 256, "3": 512},
}

# Stages projected per num_layers (projection_head.py:14-110). NOTE the r18
# 2-layer variant projects stages {1,2}, not {2,3} (projection_head.py:66-78).
PROJ_STAGES = {
    "r50": {1: ["3"], 2: ["3", "2"], 3: ["3", "2", "1"], 4: ["3", "2", "1", "0"]},
    "r18": {1: ["3"], 2: ["2", "1"], 3: ["2", "1", "0"], 4: ["3", "2", "1", "0"]},
}
PROJ_STAGES["r50_Swav"] = PROJ_STAGES["r50"]


def _base_backbone(backbone: str) -> str:
    return "r50" if backbone == "r50_Swav" else backbone


class Projection:
    """Per-stage 1x1 conv projections to proj_dim."""

    def __init__(self, num_layers=2, proj_dim=768, backbone="r50",
                 dtype=jnp.float32):
        self.num_layers = num_layers
        self.proj_dim = proj_dim
        self.backbone = _base_backbone(backbone)
        self.stages = PROJ_STAGES[self.backbone][num_layers]
        self.dtype = dtype

    def init(self, key):
        chans = STAGE_CHANNELS[self.backbone]
        keys = jax.random.split(key, len(self.stages))
        return {
            s: nn.conv_init(k, 1, 1, chans[s], self.proj_dim,
                            scheme="kaiming", dtype=self.dtype)
            for s, k in zip(self.stages, keys)
        }

    def apply(self, params, features: dict) -> dict:
        """features: {stage: NHWC} -> projected {stage: [B,H,W,proj_dim]}."""
        return {s: nn.conv2d(params[s], features[s], stride=1, padding="VALID")
                for s in params}


class ChannelProjectors:
    """Derived "channel" scale token: all stages to 7x7, channel concat,
    4x conv-BN-ReLU fusion to proj_dim -> [B, 49, 1, proj_dim]."""

    def __init__(self, backbone="r50", proj_dim=768, dtype=jnp.float32):
        self.backbone = _base_backbone(backbone)
        self.proj_dim = proj_dim
        self.dtype = dtype
        ch = STAGE_CHANNELS[self.backbone]
        self.cat_channels = ch["0"] + ch["1"] + ch["2"] + ch["3"]

    def init(self, key):
        ch = STAGE_CHANNELS[self.backbone]
        k1a, k1b, k2, kfuse = jax.random.split(key, 4)
        d = self.dtype
        p = {
            # layer1: two stride-2 3x3 convs then 2x2 maxpool (56->28->14->7)
            "l1_conv1": nn.conv_init(k1a, 3, 3, ch["0"], ch["0"], scheme="kaiming", dtype=d),
            "l1_conv2": nn.conv_init(k1b, 3, 3, ch["0"], ch["0"], scheme="kaiming", dtype=d),
            # layer2: one stride-2 conv then maxpool (28->14->7)
            "l2_conv1": nn.conv_init(k2, 3, 3, ch["1"], ch["1"], scheme="kaiming", dtype=d),
            # layer3: maxpool only (14->7); no params
        }
        # Channel_Projector_All: 4x ConvBatchNorm, first maps cat->proj_dim
        # (projection_head.py:233-268). Conv weights use torch Conv2d default
        # init (ConvBatchNorm never calls _initialize_weights).
        widths = [self.cat_channels] + [self.proj_dim] * 4
        fuse = []
        for i in range(4):
            kc = jax.random.fold_in(kfuse, i)
            fuse.append({
                "conv": nn.conv_init(kc, 3, 3, widths[i], widths[i + 1],
                                     scheme="torch", dtype=d),
                "bn": nn.batchnorm_init(widths[i + 1], d),
            })
        p["fuse"] = fuse
        return p

    def apply(self, params, features: dict, train=False,
              stats=None) -> jnp.ndarray:
        """features: raw backbone pyramid {stage: NHWC}. Returns [B,49,1,proj_dim].
        stats: optional BN running-stat collector (see ResNetBackbone.apply)."""
        x0 = nn.conv2d(params["l1_conv1"], features["0"], stride=2, padding=1)
        x0 = nn.conv2d(params["l1_conv2"], x0, stride=2, padding=1)
        x0 = nn.maxpool2d(x0)                                    # [B,7,7,c0]
        x1 = nn.conv2d(params["l2_conv1"], features["1"], stride=2, padding=1)
        x1 = nn.maxpool2d(x1)                                    # [B,7,7,c1]
        x2 = nn.maxpool2d(features["2"])                         # [B,7,7,c2]
        x3 = features["3"]                                       # [B,7,7,c3]
        # torch cats on the channel dim in stage order 0..3
        # (model_wo_extra_params.py:242-244); NHWC cat on axis -1.
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        from .resnet import _bn_or_affine
        fuse_stats = [] if stats is not None else None
        for layer in params["fuse"]:
            x = nn.conv2d(layer["conv"], x, stride=1, padding=1)
            layer_stats = {} if stats is not None else None
            x = _bn_or_affine(layer["bn"], x, train=train,
                              stats=layer_stats, key="bn")
            if stats is not None:
                fuse_stats.append(layer_stats)
            x = nn.relu(x)
        if stats is not None:
            stats["fuse"] = fuse_stats
        B = x.shape[0]
        # flatten 7x7 -> 49 tokens; torch flattens (C,H,W)->(C,49) then
        # permutes to [B,49,1,C] (model_wo_extra_params.py:246-247).
        return x.reshape(B, 49, 1, self.proj_dim)
