"""ResNet-50/18 feature-pyramid backbones, NHWC, XLA-native.

Behavioral twin of the reference's three backbone paths:
  * torchvision resnet50/resnet18 tapped at the 4 stage outputs
    (get_features, /root/reference/models/model_wo_extra_params.py:214-224);
  * ResNetTrunkByScale — torchvision ResNet minus fc returning the pyramid
    list (/root/reference/models/resnet50ssl.py:30-45), used for the
    lunit-io SSL (SwAV/BT/MoCoV2) TCGA-pretrained weights;
  * ResNet50withFC — SSL trunk + global avgpool + linear probe
    (resnet50ssl.py:104-123).

All three produce the same math; here a single functional ResNet covers
them. TPU-first choices: NHWC layout, HWIO kernels, BN in inference mode by
default (running stats — the backbone is frozen in every release config,
model_wo_extra_params.py:72-75), f32 accumulation under bf16 compute.

Parameter tree mirrors torch state_dict structure (conv1/bn1/layer{1..4}/
{i}/conv{j}/bn{j}/downsample) so the torch->JAX weight converter is a pure
rename+transpose (utils/torch_convert.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import initializers as init
from ..ops import nn

# (block type, stage block counts, base width expansion)
RESNET_SPECS = {
    50: ("bottleneck", [3, 4, 6, 3], 4),
    18: ("basic", [2, 2, 2, 2], 1),
}


def _conv_init(key, kh, kw, cin, cout, dtype):
    """torchvision ResNet conv init: kaiming fan_out / relu, no bias."""
    return {"w": init.kaiming_normal_conv_fan_out(key, (kh, kw, cin, cout), dtype)}


def _bn_or_affine(p, x, train=False, stats=None, key=None):
    """Inference-folded BN params ({scale,bias} only, via fold_bn) apply as
    a bare affine; full BN params apply normally.

    stats: optional mutable dict collector (trace-time). When given and
    train=True, the BN runs on batch statistics AND writes its
    momentum-updated running stats into stats[key] — the torch train-mode
    behavior (reference main_toy.py:20) threaded as explicit state."""
    if "mean" not in p:
        return nn.affine(p, x)
    if stats is not None and train:
        y, upd = nn.batchnorm_stats(p, x)
        stats[key] = upd
        return y
    return nn.batchnorm(p, x, train=train)


def fold_bn(params):
    """Fold every BatchNorm in a backbone param tree into (scale, bias)
    pairs (inference only — exact for the frozen backbone every release
    config uses). XLA then fuses the affine into the adjacent conv."""
    def fold(tree):
        if isinstance(tree, dict):
            if "mean" in tree and "var" in tree:
                return nn.fold_batchnorm(tree)
            return {k: fold(v) for k, v in tree.items()}
        if isinstance(tree, list):
            return [fold(v) for v in tree]
        return tree
    return fold(params)


def _bottleneck_init(key, cin, width, cout, stride, dtype):
    ks = jax.random.split(key, 4)
    p = {
        "conv1": _conv_init(ks[0], 1, 1, cin, width, dtype),
        "bn1": nn.batchnorm_init(width, dtype),
        "conv2": _conv_init(ks[1], 3, 3, width, width, dtype),
        "bn2": nn.batchnorm_init(width, dtype),
        "conv3": _conv_init(ks[2], 1, 1, width, cout, dtype),
        "bn3": nn.batchnorm_init(cout, dtype),
    }
    if stride != 1 or cin != cout:
        p["downsample"] = {
            "conv": _conv_init(ks[3], 1, 1, cin, cout, dtype),
            "bn": nn.batchnorm_init(cout, dtype),
        }
    return p


def _bottleneck_apply(p, x, stride, train=False, stats=None):
    """torchvision v1.5 bottleneck: stride lives on the 3x3 conv2."""
    idn = x
    y = nn.conv2d(p["conv1"], x, 1, "VALID")
    y = nn.relu(_bn_or_affine(p["bn1"], y, train=train, stats=stats, key="bn1"))
    y = nn.conv2d(p["conv2"], y, stride, 1)
    y = nn.relu(_bn_or_affine(p["bn2"], y, train=train, stats=stats, key="bn2"))
    y = nn.conv2d(p["conv3"], y, 1, "VALID")
    y = _bn_or_affine(p["bn3"], y, train=train, stats=stats, key="bn3")
    if "downsample" in p:
        idn = nn.conv2d(p["downsample"]["conv"], x, stride, "VALID")
        ds_stats = {} if stats is not None else None
        idn = _bn_or_affine(p["downsample"]["bn"], idn, train=train,
                            stats=ds_stats, key="bn")
        if stats is not None and ds_stats:
            stats["downsample"] = ds_stats
    return nn.relu(y + idn)


def _basic_init(key, cin, cout, stride, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "conv1": _conv_init(ks[0], 3, 3, cin, cout, dtype),
        "bn1": nn.batchnorm_init(cout, dtype),
        "conv2": _conv_init(ks[1], 3, 3, cout, cout, dtype),
        "bn2": nn.batchnorm_init(cout, dtype),
    }
    if stride != 1 or cin != cout:
        p["downsample"] = {
            "conv": _conv_init(ks[2], 1, 1, cin, cout, dtype),
            "bn": nn.batchnorm_init(cout, dtype),
        }
    return p


def _basic_apply(p, x, stride, train=False, stats=None):
    idn = x
    y = nn.conv2d(p["conv1"], x, stride, 1)
    y = nn.relu(_bn_or_affine(p["bn1"], y, train=train, stats=stats, key="bn1"))
    y = nn.conv2d(p["conv2"], y, 1, 1)
    y = _bn_or_affine(p["bn2"], y, train=train, stats=stats, key="bn2")
    if "downsample" in p:
        idn = nn.conv2d(p["downsample"]["conv"], x, stride, "VALID")
        ds_stats = {} if stats is not None else None
        idn = _bn_or_affine(p["downsample"]["bn"], idn, train=train,
                            stats=ds_stats, key="bn")
        if stats is not None and ds_stats:
            stats["downsample"] = ds_stats
    return nn.relu(y + idn)


def _stem_conv_s2d(p, x):
    """The 7x7/stride-2 stem conv as a space-to-depth 4x4/stride-1 conv —
    the standard TPU transform (DUOFORMER_S2D_STEM=1): EXACT identity.

    Derivation: front-pad the kernel to 8x8 (W'[u+1] = W[u], zero row/col
    at index 0) so the taps split as u' = 2a + p; then
      out(i,j) = sum conv7x7(x, stride 2, pad 3)
               = conv4x4(s2d(x, 2), W2, stride 1, pad (2,1))
    with W2[a,b,(p,q,c),o] = W'[2a+p, 2b+q, c, o] and the s2d channel
    order (p, q, c). The 4x4x12 contraction (192) fills the MXU K-dim
    better than 7x7x3 (147) at a quarter of the spatial positions per
    output row, and avoids the stride-2 input re-walk."""
    import jax.lax as lax

    B, H, W, C = x.shape
    w = p["w"].astype(x.dtype)                       # [7,7,3,64] HWIO
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))  # [8,8,3,64]
    w2 = wp.reshape(4, 2, 4, 2, C, w.shape[-1]) \
           .transpose(0, 2, 1, 3, 4, 5) \
           .reshape(4, 4, 4 * C, w.shape[-1])
    z = x.reshape(B, H // 2, 2, W // 2, 2, C) \
         .transpose(0, 1, 3, 2, 4, 5) \
         .reshape(B, H // 2, W // 2, 4 * C)
    y = lax.conv_general_dilated(
        z, w2, window_strides=(1, 1), padding=[(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p:      # torchvision stems are bias-free, SSL exports vary
        y = y + p["b"].astype(y.dtype)
    return y


def _use_s2d_stem() -> bool:
    import os
    return os.environ.get("DUOFORMER_S2D_STEM", "0") == "1"


class ResNetBackbone:
    """Feature-pyramid ResNet. apply() returns {"0": 56x56, "1": 28x28,
    "2": 14x14, "3": 7x7} NHWC stage features for a 224x224 input."""

    def __init__(self, depth=50, dtype=jnp.float32):
        self.depth = depth
        self.kind, self.stage_blocks, self.expansion = RESNET_SPECS[depth]
        self.dtype = dtype
        base = 64
        self.stage_widths = [base * (2 ** i) for i in range(4)]          # 64..512
        self.stage_out = [w * self.expansion for w in self.stage_widths]  # r50: 256..2048

    def init(self, key):
        kstem, *kstage = jax.random.split(key, 5)
        p = {
            "conv1": _conv_init(kstem, 7, 7, 3, 64, self.dtype),
            "bn1": nn.batchnorm_init(64, self.dtype),
        }
        cin = 64
        for si, (nblocks, width, cout) in enumerate(
                zip(self.stage_blocks, self.stage_widths, self.stage_out)):
            blocks = []
            for bi in range(nblocks):
                kb = jax.random.fold_in(kstage[si], bi)
                stride = 2 if (si > 0 and bi == 0) else 1
                if self.kind == "bottleneck":
                    blocks.append(_bottleneck_init(kb, cin, width, cout, stride, self.dtype))
                else:
                    blocks.append(_basic_init(kb, cin, cout, stride, self.dtype))
                cin = cout
            p[f"layer{si + 1}"] = blocks
        return p

    def apply(self, params, x, train=False, stats=None):
        """x: [B, 224, 224, 3] NHWC -> stage feature dict.

        stats: optional mutable dict; when given with train=True every BN
        runs on batch statistics and its momentum-updated running stats
        land in a params-shaped subtree (merge back with
        utils.checkpoint.merge_tree / train-step bn_stats support)."""
        block_apply = _bottleneck_apply if self.kind == "bottleneck" else _basic_apply
        if _use_s2d_stem() and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            y = _stem_conv_s2d(params["conv1"], x)
        else:
            y = nn.conv2d(params["conv1"], x, 2, 3)
        y = nn.relu(_bn_or_affine(params["bn1"], y, train=train,
                                  stats=stats, key="bn1"))
        y = nn.maxpool2d(y, window=3, stride=2, padding=1)
        features = {}
        for si in range(4):
            layer_stats = [] if stats is not None else None
            for bi, blk in enumerate(params[f"layer{si + 1}"]):
                stride = 2 if (si > 0 and bi == 0) else 1
                blk_stats = {} if stats is not None else None
                y = block_apply(blk, y, stride, train=train, stats=blk_stats)
                if stats is not None:
                    layer_stats.append(blk_stats)
            if stats is not None:
                stats[f"layer{si + 1}"] = layer_stats
            features[str(si)] = y
        return features


class ResNet50withFC:
    """SSL trunk + frozen-feature linear probe (resnet50ssl.py:104-123)."""

    def __init__(self, num_classes=4, dtype=jnp.float32):
        self.backbone = ResNetBackbone(50, dtype)
        self.num_classes = num_classes
        self.dtype = dtype

    def init(self, key):
        kb, kf = jax.random.split(key)
        return {
            "trunk": self.backbone.init(kb),
            "fc": nn.linear_init(kf, 2048, self.num_classes, scheme="torch",
                                 dtype=self.dtype),
        }

    def apply(self, params, x, rng=None, train=False, freeze=True,
              bn_batch_stats=None, bn_stats=None):
        """bn_batch_stats: BN mode for the trunk. None (default) uses
        running stats when frozen; True forces per-batch statistics — the
        reference's actual train-mode behavior (torch model.train() keeps
        BN in batch-stat mode even for requires_grad=False params,
        main_toy.py:20). rng is accepted (unused — no dropout) so the
        generic train step can drive this family. bn_stats: optional
        mutable dict collecting running-stat updates (see DuoFormer.apply)
        when training with batch-stat BN."""
        collect = {} if bn_stats is not None and train else None
        bn_train = bn_batch_stats if bn_batch_stats is not None \
            else bool(collect) or (train and not freeze)
        feats = self.backbone.apply(params["trunk"], x, train=bn_train,
                                    stats=collect)
        if collect:
            bn_stats["trunk"] = collect
        h = feats["3"]
        if freeze:
            h = jax.lax.stop_gradient(h)
        pooled = nn.avgpool_global(h)
        return nn.linear(params["fc"], pooled)
