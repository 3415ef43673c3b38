"""Oracle de-circularization (VERDICT r1 Weak #4): the torch oracle's
state_dict keys are pinned against the reference's expected checkpoint key
sets, derived STATICALLY here from the reference class definitions (every
block cites file:line). A misreading in the oracle that changes the
parameter inventory now fails loudly instead of silently passing parity.

Documented, intentional divergences (see docs/parity.md):
  * backbone layout — the reference's torchvision models wrap the trunk in
    nn.Sequential(*children[:-2]) giving NUMERIC keys
    ("resnet_projector.0.weight", model_wo_extra_params.py:56-58,
    model.py:42-44); the oracle uses the NAMED torchvision layout
    ("conv1", "layer1.0...") which is also what the lunit-io SSL trunks
    ship (resnet50ssl.py:30-45). The converter consumes both
    (torch_convert._normalize_resnet_keys); this test checks the oracle's
    named keys map 1:1 onto the numeric pattern through that exact table.
  * legacy dead params — MultiscaleTransformer inherits timm
    VisionTransformer, so real checkpoints carry a patch_embed.proj
    conv (created by super().__init__, multi_vision_transformer.py:41-46)
    that no live forward path touches; the oracle omits it and the
    converter ignores it.
"""

from duoformer_tcga_tpu.utils.torch_convert import _SEQ_NAMES

from torch_oracle import (OracleDuoFormer, OracleDuoFormerLegacy,
                          OracleTimmHybridViT)


def _ln(prefix):
    return {f"{prefix}.weight", f"{prefix}.bias"}


def _linear(prefix):
    return {f"{prefix}.weight", f"{prefix}.bias"}


def _bn(prefix):
    return {f"{prefix}.weight", f"{prefix}.bias", f"{prefix}.running_mean",
            f"{prefix}.running_var", f"{prefix}.num_batches_tracked"}


def _resnet50_named_keys(prefix):
    """torchvision ResNet-50 trunk keys, named layout (Bottleneck [3,4,6,3],
    resnet50ssl.py:12-45)."""
    keys = {f"{prefix}conv1.weight"} | _bn(f"{prefix}bn1")
    blocks = [3, 4, 6, 3]
    for si, n in enumerate(blocks):
        for bi in range(n):
            pre = f"{prefix}layer{si + 1}.{bi}"
            for ci in (1, 2, 3):
                keys.add(f"{pre}.conv{ci}.weight")
                keys |= _bn(f"{pre}.bn{ci}")
            if bi == 0:   # every stage's first block downsamples in r50
                keys.add(f"{pre}.downsample.0.weight")
                keys |= _bn(f"{pre}.downsample.1")
    return keys


def _scale_block_keys(pre, init_values=False, qk_norm=False):
    """ScaleBlock (scale_attention.py:48-93): norm1 + AttentionForScale
    (timm Attention params) + norm2 + Mlp (+ LayerScale gammas)."""
    keys = _ln(f"{pre}.norm1") | _linear(f"{pre}.attn.qkv") | \
        _linear(f"{pre}.attn.proj") | _ln(f"{pre}.norm2") | \
        _linear(f"{pre}.mlp.fc1") | _linear(f"{pre}.mlp.fc2")
    if qk_norm:     # Q9: created iff attn_drop_rate > 0
        keys |= _ln(f"{pre}.attn.q_norm") | _ln(f"{pre}.attn.k_norm")
    if init_values:
        keys |= {f"{pre}.ls1.gamma", f"{pre}.ls2.gamma"}
    return keys


def _patch_block_keys(pre, qk_norm=False):
    """PatchBlock (scale_attention.py:214-236): bare AttentionForPatch."""
    keys = _linear(f"{pre}.attn.qkv") | _linear(f"{pre}.attn.proj")
    if qk_norm:
        keys |= _ln(f"{pre}.attn.q_norm") | _ln(f"{pre}.attn.k_norm")
    return keys


def _multiscale_former_keys(depth, init_values=False, qk_norm=False,
                            prefix="vision_transformer."):
    """MultiscaleFormer (scale_attention.py:239-330): scaleBlocks, blocks,
    pos_embed_for_scale, cls_token, pos_embed, fc_norm, head."""
    keys = set()
    for i in range(depth):
        keys |= _scale_block_keys(f"{prefix}scaleBlocks.{i}", init_values,
                                  qk_norm)
        keys |= _patch_block_keys(f"{prefix}blocks.{i}", qk_norm)
    keys |= {f"{prefix}pos_embed_for_scale", f"{prefix}cls_token",
             f"{prefix}pos_embed"}
    keys |= _ln(f"{prefix}fc_norm") | _linear(f"{prefix}head")
    return keys


def _multiscale_transformer_keys(depth, prefix="vision_transformer."):
    """MultiscaleTransformer (multi_vision_transformer.py:19-112): timm-ViT
    inherited params + MultiscaleBlocks with TWO attention sets; MyModel
    passes attn_drop_rate=0.1 (model.py:94) -> Q9 q/k norms on the
    inherited set; init_values=1e-5 default -> LayerScale gammas."""
    keys = {f"{prefix}cls_token", f"{prefix}pos_embed",
            f"{prefix}pos_embed_for_scale"}
    keys |= _ln(f"{prefix}norm") | _linear(f"{prefix}head")
    for i in range(depth):
        pre = f"{prefix}blocks.{i}"
        keys |= _ln(f"{pre}.norm1") | _ln(f"{pre}.norm2")
        keys |= _linear(f"{pre}.attn.qkv") | _linear(f"{pre}.attn.proj")
        keys |= _ln(f"{pre}.attn.q_norm") | _ln(f"{pre}.attn.k_norm")  # Q9
        keys |= _linear(f"{pre}.attn.qkv1") | _linear(f"{pre}.attn.proj1")
        keys |= _linear(f"{pre}.mlp.fc1") | _linear(f"{pre}.mlp.fc2")
        keys |= {f"{pre}.ls1.gamma", f"{pre}.ls2.gamma"}
    return keys


def _channel_proj_keys():
    """Channel projectors (projection_head.py:152-268): chann_proj1
    (conv1, conv2), chann_proj2 (conv1), chann_proj3 (pool only — NO
    params), chann_proj_all.nConvs.{0..3}.{conv,norm}."""
    keys = _linear("chann_proj1.conv1") | _linear("chann_proj1.conv2") | \
        _linear("chann_proj2.conv1")
    for i in range(4):
        keys |= _linear(f"chann_proj_all.nConvs.{i}.conv")
        keys |= _bn(f"chann_proj_all.nConvs.{i}.norm")
    return keys


def _named_to_numeric(key):
    """Oracle named-trunk key -> the reference's Sequential numeric key
    (model_wo_extra_params.py:56-58 wraps children[:-2])."""
    prefix, _, rest = key.partition(".")
    assert prefix == "resnet_projector"
    first, _, tail = rest.partition(".")
    return f"resnet_projector.{_SEQ_NAMES[first]}.{tail}"


def test_release_family_keyset():
    """OracleDuoFormer (random token, 2-scale, depth 2) == the reference's
    MyModel_no_extra_params checkpoint inventory."""
    oracle = OracleDuoFormer(depth=2, num_layers=2)
    keys = set(oracle.state_dict().keys())

    trunk = {k for k in keys if k.startswith("resnet_projector.")}
    rest = keys - trunk

    expected_rest = (
        {"channel_token"}
        | _linear("projection.proj_heads3") | _linear("projection.proj_heads2")
        | _multiscale_former_keys(depth=2))
    assert rest == expected_rest

    # named trunk keys map 1:1 onto the reference's numeric Sequential
    # pattern via the converter's table
    assert trunk == _resnet50_named_keys("resnet_projector.")
    numeric = {_named_to_numeric(k) for k in trunk}
    assert len(numeric) == len(trunk)
    assert all(k.split(".")[1] in {"0", "1", "4", "5", "6", "7"}
               for k in numeric)


def test_release_channel_layerscale_qknorm_keyset():
    """Channel-token + LayerScale + Q9-active variant inventory."""
    import torch
    torch.manual_seed(0)
    oracle = OracleDuoFormer(depth=2, num_layers=2, scale_token="channel",
                             init_values=1e-5, qk_norm=True)
    keys = {k for k in oracle.state_dict() if not k.startswith("resnet_projector.")}
    expected = (
        _channel_proj_keys()
        | _linear("projection.proj_heads3") | _linear("projection.proj_heads2")
        | _multiscale_former_keys(depth=2, init_values=True, qk_norm=True))
    assert keys == expected


def test_legacy_family_keyset():
    """OracleDuoFormerLegacy == MyModel inventory MINUS the documented dead
    timm patch_embed conv (inherited, never used)."""
    import torch
    torch.manual_seed(0)
    oracle = OracleDuoFormerLegacy(depth=2)
    keys = {k for k in oracle.state_dict() if not k.startswith("resnet_projector.")}
    expected = (
        _channel_proj_keys()
        | _linear("projection.proj_heads3") | _linear("projection.proj_heads2")
        | _multiscale_transformer_keys(depth=2))
    # the real checkpoint additionally carries the inherited (dead)
    # patch_embed conv — documented divergence, ignored by the converter
    dead = _linear("vision_transformer.patch_embed.proj")
    assert keys == expected
    assert not (dead & keys)


def test_hybrid_keyset():
    """OracleTimmHybridViT == timm vit_small_r26_s32-style inventory."""
    oracle = OracleTimmHybridViT(layers=(2, 2, 2, 2), embed_dim=384,
                                 depth=2, num_heads=6)
    keys = set(oracle.state_dict().keys())
    expected = {"cls_token", "pos_embed"}
    expected |= _linear("patch_embed.proj")
    expected |= {"patch_embed.backbone.stem.conv.weight"}
    expected |= _ln("patch_embed.backbone.stem.norm")
    outs = [256, 512, 1024, 2048]
    cin = 64
    for si, n in enumerate([2, 2, 2, 2]):
        for bi in range(n):
            pre = f"patch_embed.backbone.stages.{si}.blocks.{bi}"
            for ci in (1, 2, 3):
                expected.add(f"{pre}.conv{ci}.weight")
                expected |= _ln(f"{pre}.norm{ci}")
            stride = 2 if (si > 0 and bi == 0) else 1
            if stride != 1 or cin != outs[si]:
                expected.add(f"{pre}.downsample.conv.weight")
                expected |= _ln(f"{pre}.downsample.norm")
            cin = outs[si]
    for i in range(2):
        expected |= _scale_block_keys(f"blocks.{i}")
    expected |= _ln("norm") | _linear("head")
    assert keys == expected
