"""DuoFormer model assembly.

Two variants, matching the reference's model families:
  * DuoFormer        — behavioral twin of MyModel_no_extra_params
    (/root/reference/models/model_wo_extra_params.py:29-302): ResNet pyramid
    -> per-stage 1x1 projections -> region regroup -> learned ("random") or
    derived ("channel") scale token -> MultiscaleFormer core.
  * DuoFormerLegacy  — behavioral twin of MyModel (model.py:22-341):
    always-derived channel token, MultiscaleTransformer core (inherited-ViT
    quirks Q4/Q12/Q13). Works only for num_layers=2, as in the reference
    (Q5: the 3/4-scale branches index projections that were never created,
    model.py:291,311-321).

Pipeline shape trail (2-scale release config, B x 224 x 224 x 3 input):
  backbone -> {56^2x256, 28^2x512, 14^2x1024, 7^2x2048}  (NHWC)
  projection -> {14^2x768, 7^2x768}
  regroup -> [B, 49, 5, 768]; +scale token -> [B, 49, 6, 768]
  transformer -> logits [B, num_classes]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import initializers as init
from . import regroup
from .projection import ChannelProjectors, Projection
from .resnet import ResNetBackbone
from .transformer import MultiscaleFormer, MultiscaleTransformer


def _backbone_depth(name: str) -> int:
    return 18 if name == "r18" else 50


class DuoFormer:
    """Release-variant DuoFormer (MyModel_no_extra_params twin)."""

    def __init__(self, depth=12, embed_dim=768, num_heads=12,
                 num_classes=2, num_layers=2, num_patches=49, mlp_ratio=4.0,
                 attn_drop_rate=0.0, proj_drop_rate=0.0, proj_dim=768,
                 freeze_backbone=True, backbone="r50", scale_token="random",
                 patch_attn=True, init_values=None, remat=False,
                 apply_fc_norm=False, dtype=jnp.float32):
        if scale_token not in ("random", "channel"):
            raise ValueError(f"scale_token must be 'random' or 'channel', got {scale_token}")
        self.num_layers = num_layers
        self.proj_dim = proj_dim
        self.backbone_name = backbone
        self.scale_token = scale_token
        self.freeze_backbone = freeze_backbone
        self.dtype = dtype
        self.resnet = ResNetBackbone(_backbone_depth(backbone), dtype)
        self.projection = Projection(num_layers, proj_dim, backbone, dtype)
        if scale_token == "channel":
            self.channel_proj = ChannelProjectors(backbone, proj_dim, dtype)
        self.transformer = MultiscaleFormer(
            depth=depth, scales=num_layers, num_heads=num_heads,
            embed_dim=embed_dim, mlp_ratio=mlp_ratio, qkv_bias=True,
            proj_drop_rate=proj_drop_rate,
            attn_drop_rate=attn_drop_rate, init_values=init_values,
            num_classes=num_classes, num_patches=num_patches,
            patch_attn=patch_attn, remat=remat,
            apply_fc_norm=apply_fc_norm, dtype=dtype)

    def init(self, key):
        kb, kp, kc, kt, ktok = jax.random.split(key, 5)
        p = {
            "backbone": self.resnet.init(kb),
            "projection": self.projection.init(kp),
            "transformer": self.transformer.init(kt),
        }
        if self.scale_token == "random":
            # learned (1,1,1,proj_dim) token, normal std 0.036
            # (model_wo_extra_params.py:77-79)
            p["scale_token"] = init.normal(ktok, (1, 1, 1, self.proj_dim),
                                           std=0.036, dtype=self.dtype)
        else:
            p["channel_proj"] = self.channel_proj.init(kc)
        return p

    def features(self, params, x, train=False, bn_batch_stats=None,
                 stats=None):
        """Backbone pyramid; frozen by default (stop_gradient,
        model_wo_extra_params.py:72-75).

        BN mode: eval (running stats) by default even in training — a
        deliberate deviation; the reference's model.train() keeps BN in
        batch-stat mode even when frozen. bn_batch_stats=True restores the
        reference behavior (matters when fine-tuning from checkpoints).
        stats: optional running-stat collector (ResNetBackbone.apply)."""
        bn_train = bn_batch_stats if bn_batch_stats is not None \
            else (train and not self.freeze_backbone)
        feats = self.resnet.apply(params["backbone"], x, train=bn_train,
                                  stats=stats)
        if self.freeze_backbone:
            feats = jax.tree.map(jax.lax.stop_gradient, feats)
        return feats

    def apply(self, params, x, rng=None, train=False, bn_stats=None,
              with_embedding=False):
        """x: [B, 224, 224, 3] NHWC -> logits [B, num_classes].

        with_embedding=True -> (logits, cls [B, embed_dim]): the pre-head
        CLS tile embedding, the standard per-tile representation for
        slide-level MIL aggregation (the serving analog of the reference's
        get_features backbone taps, model_wo_extra_params.py:214-224).

        bn_stats: optional mutable dict. When passed with train=True, every
        BatchNorm runs on batch statistics and its momentum-updated running
        stats land in a params-shaped subtree under bn_stats (torch
        train-mode semantics, main_toy.py:20); merge into params with
        train.merge_bn_stats — make_train_step(bn_stats=True) does this."""
        B = x.shape[0]
        bb_stats = {} if bn_stats is not None and train else None
        feats = self.features(params, x, train=train, stats=bb_stats,
                              bn_batch_stats=True if bb_stats else None)
        if bb_stats:
            bn_stats["backbone"] = bb_stats

        if self.scale_token == "channel":
            cp_stats = {} if bn_stats is not None and train else None
            token = self.channel_proj.apply(params["channel_proj"], feats,
                                            train=train,
                                            stats=cp_stats)    # [B,49,1,C]
            if cp_stats:
                bn_stats["channel_proj"] = cp_stats
        else:
            token = jnp.broadcast_to(
                params["scale_token"].astype(x.dtype),
                (B, 49, 1, self.proj_dim))

        stages = regroup.stages_for(self.num_layers)
        proj = self.projection.apply(
            params["projection"], {s: feats[s] for s in self.projection.stages})
        tokens = regroup.regroup(proj, stages)                 # [B,49,S,C]
        tokens = jnp.concatenate([token, tokens], axis=2)      # [B,49,S+1,C]
        return self.transformer.apply(params["transformer"], tokens,
                                      rng=rng, train=train,
                                      with_embedding=with_embedding)


class DuoFormerLegacy:
    """MyModel twin: derived channel token + MultiscaleTransformer core.

    Only num_layers=2 is constructible-and-runnable in the reference (Q5);
    we enforce that. proj_dim must equal the channel fuser's 768 output for
    the token concat to type-check, as in the reference
    (projection_head.py:261 hardcodes 768)."""

    def __init__(self, depth=12, embed_dim=768, num_heads=12,
                 num_classes=2, num_layers=2, num_patches=49,
                 proj_dim=768, init_values=1e-5, freeze=True,
                 attn_drop_rate=0.1, drop_rate=0.1, pretrained_backbone=True,
                 remat=False, dtype=jnp.float32):
        if num_layers != 2:
            raise ValueError(
                "DuoFormerLegacy supports num_layers=2 only (reference Q5: "
                "MyModel projects stages {2,3} but 3/4-scale branches index "
                "missing projections, model.py:291,311-321)")
        self.num_layers = num_layers
        self.proj_dim = proj_dim
        self.freeze_backbone = freeze
        self.dtype = dtype
        self.resnet = ResNetBackbone(50, dtype)
        self.projection = Projection(num_layers, proj_dim, "r50", dtype)
        self.channel_proj = ChannelProjectors("r50", proj_dim, dtype)
        self.transformer = MultiscaleTransformer(
            depth=depth, scales=num_layers, num_heads=num_heads,
            embed_dim=embed_dim, qkv_bias=True,
            drop_rate=drop_rate, attn_drop_rate=attn_drop_rate,
            init_values=init_values, num_classes=num_classes,
            num_patches=num_patches, remat=remat, dtype=dtype)

    def init(self, key):
        kb, kp, kc, kt = jax.random.split(key, 4)
        return {
            "backbone": self.resnet.init(kb),
            "projection": self.projection.init(kp),
            "channel_proj": self.channel_proj.init(kc),
            "transformer": self.transformer.init(kt),
        }

    def apply(self, params, x, rng=None, train=False, bn_stats=None,
              with_embedding=False):
        B = x.shape[0]
        bb_stats = {} if bn_stats is not None and train else None
        bn_train = (train and not self.freeze_backbone) or bool(bb_stats)
        feats = self.resnet.apply(params["backbone"], x, train=bn_train,
                                  stats=bb_stats)
        if bb_stats:
            bn_stats["backbone"] = bb_stats
        if self.freeze_backbone:
            feats = jax.tree.map(jax.lax.stop_gradient, feats)
        # channel token is ALWAYS computed in MyModel (model.py:279-289)
        cp_stats = {} if bn_stats is not None and train else None
        token = self.channel_proj.apply(params["channel_proj"], feats,
                                        train=train, stats=cp_stats)
        if cp_stats:
            bn_stats["channel_proj"] = cp_stats
        proj = self.projection.apply(
            params["projection"], {s: feats[s] for s in self.projection.stages})
        tokens = regroup.regroup(proj, regroup.stages_for(self.num_layers))
        tokens = jnp.concatenate([token, tokens], axis=2)
        return self.transformer.apply(params["transformer"], tokens,
                                      rng=rng, train=train,
                                      with_embedding=with_embedding)


def fold_for_inference(params):
    """Inference-optimized params: every backbone / channel-fuser
    BatchNorm folded to a bare affine (exact under frozen/eval BN — the
    only mode the release configs use). Use for serving and benchmarks."""
    from .resnet import fold_bn

    out = dict(params)
    out["backbone"] = fold_bn(params["backbone"])
    if "channel_proj" in params:
        out["channel_proj"] = fold_bn(params["channel_proj"])
    return out


def count_parameters(params, trainable_mask=None):
    """(trainable_M, total_M) like the reference's count_parameters
    (model.py:449-452). With no mask, trainable == total."""
    leaves = jax.tree.leaves(params)
    total = sum(l.size for l in leaves)
    if trainable_mask is None:
        trainable = total
    else:
        tleaves = jax.tree.leaves(trainable_mask)
        trainable = sum(l.size for l, m in zip(leaves, tleaves) if m)
    return trainable / 1e6, total / 1e6
