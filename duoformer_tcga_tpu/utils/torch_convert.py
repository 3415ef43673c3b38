"""torch -> JAX parameter conversion.

Maps reference checkpoints (torch state_dicts) onto this framework's
parameter pytrees. Handles:
  * torchvision-style ResNet trunks, both key layouts the reference
    produces: the `nn.Sequential(*children)` numeric layout
    ("0.weight", "4.0.conv1.weight", ... — model_wo_extra_params.py:56-58)
    and the named layout ("conv1.weight", "layer1.0.conv1.weight" — the
    lunit-io SSL trunks, resnet50ssl.py:30-45).
  * The release-variant DuoFormer (MyModel_no_extra_params) including its
    MultiscaleFormer core (scale_attention.py:239-344).
  * The legacy MyModel / MultiscaleTransformer core (timm-inherited names:
    blocks.{i}.attn.qkv1/proj1 for the scale pass, .attn.qkv/proj for the
    region pass — multiscale_attn.py:144-147).

Tensor layout transforms (torch -> ours):
  Linear  [out, in]   -> [in, out]      (transpose)
  Conv2d  OIHW        -> HWIO           (permute 2,3,1,0)
  LayerNorm weight/bias -> scale/bias
  BatchNorm weight/bias/running_mean/running_var -> scale/bias/mean/var

The reference's released checkpoints pickle whole module objects (Q14,
main_toy.py:139-149); `state_dict_from_reference_checkpoint` extracts a
state_dict from such files with stub classes, without needing the reference
importable.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp


def _t(x) -> np.ndarray:
    """torch tensor / array-like -> numpy array (always a COPY: .numpy()
    shares storage with the tensor, and jnp.asarray on CPU can be
    zero-copy, so without the copy a later in-place torch mutation — e.g.
    a train-mode BN updating running_mean — would silently change the
    converted params)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.array(x)


def _linear(sd, prefix):
    p = {"w": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        p["b"] = _t(sd[f"{prefix}.bias"])
    return p


def _conv(sd, prefix):
    p = {"w": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        p["b"] = _t(sd[f"{prefix}.bias"])
    return p


def _layernorm(sd, prefix):
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def _batchnorm(sd, prefix):
    return {
        "scale": _t(sd[f"{prefix}.weight"]),
        "bias": _t(sd[f"{prefix}.bias"]),
        "mean": _t(sd[f"{prefix}.running_mean"]),
        "var": _t(sd[f"{prefix}.running_var"]),
    }


# ---------------------------------------------------------------------------
# ResNet trunk
# ---------------------------------------------------------------------------

# torchvision children order -> Sequential numeric names
# (model_wo_extra_params.py:56: Sequential(*children[:-2]))
_SEQ_NAMES = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
              "layer3": "6", "layer4": "7"}


def _normalize_resnet_keys(sd: Dict, prefix: str = "") -> Dict:
    """Return a sub-state_dict with canonical torchvision names
    (conv1/bn1/layerN...), whichever of the two layouts the input uses."""
    out = {}
    rev = {v: k for k, v in _SEQ_NAMES.items()}
    for k, v in sd.items():
        if prefix:
            if not k.startswith(prefix):
                continue
            k = k[len(prefix):]
        first, _, rest = k.partition(".")
        if first in rev:                      # numeric Sequential layout
            out[f"{rev[first]}.{rest}"] = v
        else:                                 # named layout
            out[k] = v
    return out


def convert_resnet(sd: Dict, depth: int = 50, prefix: str = "") -> Dict:
    """torchvision/SSL ResNet state_dict -> ResNetBackbone param tree."""
    sd = _normalize_resnet_keys(sd, prefix)
    stage_blocks = {50: [3, 4, 6, 3], 18: [2, 2, 2, 2]}[depth]
    n_convs = {50: 3, 18: 2}[depth]
    p = {"conv1": _conv(sd, "conv1"), "bn1": _batchnorm(sd, "bn1")}
    for si, nblocks in enumerate(stage_blocks):
        layer = []
        for bi in range(nblocks):
            pre = f"layer{si + 1}.{bi}"
            blk = {}
            for ci in range(1, n_convs + 1):
                blk[f"conv{ci}"] = _conv(sd, f"{pre}.conv{ci}")
                blk[f"bn{ci}"] = _batchnorm(sd, f"{pre}.bn{ci}")
            if f"{pre}.downsample.0.weight" in sd:
                blk["downsample"] = {
                    "conv": _conv(sd, f"{pre}.downsample.0"),
                    "bn": _batchnorm(sd, f"{pre}.downsample.1"),
                }
            layer.append(blk)
        p[f"layer{si + 1}"] = layer
    return p


def resnet_to_torch_state_dict(params: Dict, depth: int = 50) -> Dict:
    """ResNetBackbone param tree -> torchvision-named torch state_dict
    (the exact inverse of convert_resnet). Lets a trunk trained in this
    framework be exported for torch interop — and round-tripped through
    the `--train.init_backbone=` converter path (warm-start workflows,
    e.g. the end-to-end convergence proof in tests/test_convergence.py).
    Values are torch tensors; save with torch.save(sd, path)."""
    import torch

    def t(x):
        return torch.from_numpy(np.array(x)).contiguous()

    def put_conv(out, name, p):
        out[f"{name}.weight"] = t(p["w"]).permute(3, 2, 0, 1).contiguous()
        if "b" in p:
            out[f"{name}.bias"] = t(p["b"])

    def put_bn(out, name, p):
        out[f"{name}.weight"] = t(p["scale"])
        out[f"{name}.bias"] = t(p["bias"])
        out[f"{name}.running_mean"] = t(p["mean"])
        out[f"{name}.running_var"] = t(p["var"])
        out[f"{name}.num_batches_tracked"] = torch.zeros((),
                                                         dtype=torch.int64)

    stage_blocks = {50: [3, 4, 6, 3], 18: [2, 2, 2, 2]}[depth]
    n_convs = {50: 3, 18: 2}[depth]
    sd: Dict = {}
    put_conv(sd, "conv1", params["conv1"])
    put_bn(sd, "bn1", params["bn1"])
    for si, nblocks in enumerate(stage_blocks):
        for bi in range(nblocks):
            blk = params[f"layer{si + 1}"][bi]
            pre = f"layer{si + 1}.{bi}"
            for ci in range(1, n_convs + 1):
                put_conv(sd, f"{pre}.conv{ci}", blk[f"conv{ci}"])
                put_bn(sd, f"{pre}.bn{ci}", blk[f"bn{ci}"])
            if "downsample" in blk:
                put_conv(sd, f"{pre}.downsample.0", blk["downsample"]["conv"])
                put_bn(sd, f"{pre}.downsample.1", blk["downsample"]["bn"])
    return sd


# ---------------------------------------------------------------------------
# Transformer stacks
# ---------------------------------------------------------------------------

def _stack(block_trees):
    """List of per-block param trees -> stacked-leading-axis tree (the
    lax.scan layout used by models/transformer.py)."""
    import jax
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                        *block_trees)


def _attn(sd, pre):
    p = {"qkv": _linear(sd, f"{pre}.qkv"), "proj": _linear(sd, f"{pre}.proj")}
    # qk-norm LayerNorms when enabled (timm hook; also created by quirk Q9)
    if f"{pre}.q_norm.weight" in sd:
        p["q_norm"] = _layernorm(sd, f"{pre}.q_norm")
        p["k_norm"] = _layernorm(sd, f"{pre}.k_norm")
    return p


def _scale_block(sd, pre, has_ls):
    blk = {
        "norm1": _layernorm(sd, f"{pre}.norm1"),
        "attn": _attn(sd, f"{pre}.attn"),
        "norm2": _layernorm(sd, f"{pre}.norm2"),
        "mlp": {"fc1": _linear(sd, f"{pre}.mlp.fc1"),
                "fc2": _linear(sd, f"{pre}.mlp.fc2")},
    }
    if has_ls:
        blk["ls1"] = {"gamma": _t(sd[f"{pre}.ls1.gamma"])}
        blk["ls2"] = {"gamma": _t(sd[f"{pre}.ls2.gamma"])}
    return blk


def convert_multiscale_former(sd: Dict, depth: int = 12,
                              prefix: str = "vision_transformer.") -> Dict:
    """MultiscaleFormer state_dict -> param tree (scale_attention.py names)."""
    g = lambda k: f"{prefix}{k}"
    has_ls = g("scaleBlocks.0.ls1.gamma") in sd
    scale_blocks = [_scale_block(sd, g(f"scaleBlocks.{i}"), has_ls)
                    for i in range(depth)]
    patch_blocks = [
        {"attn": _attn(sd, g(f"blocks.{i}.attn"))} for i in range(depth)
    ]
    return {
        "scale_blocks": _stack(scale_blocks),
        "patch_blocks": _stack(patch_blocks),
        "pos_embed_for_scale": _t(sd[g("pos_embed_for_scale")]),
        "pos_embed": _t(sd[g("pos_embed")]),
        "cls_token": _t(sd[g("cls_token")]),
        "fc_norm": _layernorm(sd, g("fc_norm")),
        "head": _linear(sd, g("head")),
    }


def convert_multiscale_transformer(sd: Dict, depth: int = 12,
                                   prefix: str = "vision_transformer.") -> Dict:
    """MultiscaleTransformer (legacy/timm-inherited) state_dict -> tree.

    blocks.{i}.attn.qkv1/proj1 -> attn1 (scale pass);
    blocks.{i}.attn.qkv/proj (+ q_norm/k_norm when present) -> attn2
    (region pass) (multiscale_attn.py:144-147 / timm Attention).
    The q_norm/k_norm weights exist in MyModel checkpoints via quirk Q9
    (attn_drop_rate=0.1 lands in timm's qk_norm slot, model.py:94); they
    are converted so the tree round-trips, and the model carries them
    WITHOUT applying them, exactly like forward_with_region
    (multiscale_attn.py:195-219). Unused inherited timm params
    (patch_embed.*) are ignored."""
    g = lambda k: f"{prefix}{k}"
    has_ls = g("blocks.0.ls1.gamma") in sd
    blocks = []
    for i in range(depth):
        pre = g(f"blocks.{i}")
        blk = {
            "norm1": _layernorm(sd, f"{pre}.norm1"),
            "attn1": {"qkv": _linear(sd, f"{pre}.attn.qkv1"),
                      "proj": _linear(sd, f"{pre}.attn.proj1")},
            "attn2": _attn(sd, f"{pre}.attn"),
            "norm2": _layernorm(sd, f"{pre}.norm2"),
            "mlp": {"fc1": _linear(sd, f"{pre}.mlp.fc1"),
                    "fc2": _linear(sd, f"{pre}.mlp.fc2")},
        }
        if has_ls:
            blk["ls1"] = {"gamma": _t(sd[f"{pre}.ls1.gamma"])}
            blk["ls2"] = {"gamma": _t(sd[f"{pre}.ls2.gamma"])}
        blocks.append(blk)
    return {
        "blocks": _stack(blocks),
        "pos_embed_for_scale": _t(sd[g("pos_embed_for_scale")]),
        "pos_embed": _t(sd[g("pos_embed")]),
        "cls_token": _t(sd[g("cls_token")]),
        "norm": _layernorm(sd, g("norm")),
        "head": _linear(sd, g("head")),
    }


# ---------------------------------------------------------------------------
# Full models
# ---------------------------------------------------------------------------

def _convert_projection(sd: Dict, stages, prefix="projection.") -> Dict:
    # proj_heads3 -> "3", etc. (projection_head.py:22-59); single-stage
    # models use the unsuffixed "proj_heads" (projection_head.py:16).
    out = {}
    for s in stages:
        key = f"{prefix}proj_heads{s}"
        if f"{key}.weight" not in sd and len(stages) == 1:
            key = f"{prefix}proj_heads"
        out[s] = _conv(sd, key)
    return out


def _convert_channel_proj(sd: Dict, prefix="") -> Dict:
    p = {
        "l1_conv1": _conv(sd, f"{prefix}chann_proj1.conv1"),
        "l1_conv2": _conv(sd, f"{prefix}chann_proj1.conv2"),
        "l2_conv1": _conv(sd, f"{prefix}chann_proj2.conv1"),
        "fuse": [
            {"conv": _conv(sd, f"{prefix}chann_proj_all.nConvs.{i}.conv"),
             "bn": _batchnorm(sd, f"{prefix}chann_proj_all.nConvs.{i}.norm")}
            for i in range(4)
        ],
    }
    return p


def convert_vit(sd: Dict, depth: int = 12, prefix: str = "",
                patch_embed: bool = True) -> Dict:
    """timm-style VisionTransformer state_dict -> models/vit.py tree.
    Covers the ViTBase16 baseline and HybridModel's ViT core
    (model.py:356-358,415-446)."""
    g = lambda k: f"{prefix}{k}"
    has_ls = g("blocks.0.ls1.gamma") in sd
    p = {
        "cls_token": _t(sd[g("cls_token")]),
        "pos_embed": _t(sd[g("pos_embed")]),
        "blocks": _stack([_scale_block(sd, g(f"blocks.{i}"), has_ls)
                          for i in range(depth)]),
        "norm": _layernorm(sd, g("norm")),
        "head": _linear(sd, g("head")),
    }
    if patch_embed and g("patch_embed.proj.weight") in sd:
        p["patch_embed"] = _conv(sd, g("patch_embed.proj"))
    return p


def _groupnorm(sd, prefix):
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def convert_resnetv2(sd: Dict, layers, prefix: str = "") -> Dict:
    """timm ResNetV2 trunk state_dict (stem.conv/stem.norm/
    stages.{s}.blocks.{b}.{convN,normN,downsample.*}) -> ResNetV2Trunk
    params. Weight standardization is applied at forward time, so weights
    convert raw."""
    g = lambda k: f"{prefix}{k}"
    p = {"stem": {"conv": _conv(sd, g("stem.conv")),
                  "norm": _groupnorm(sd, g("stem.norm"))}}
    stages = []
    for si, nblocks in enumerate(layers):
        blocks = []
        for bi in range(nblocks):
            pre = g(f"stages.{si}.blocks.{bi}")
            blk = {}
            for ci in range(1, 4):
                blk[f"conv{ci}"] = _conv(sd, f"{pre}.conv{ci}")
                blk[f"norm{ci}"] = _groupnorm(sd, f"{pre}.norm{ci}")
            if f"{pre}.downsample.conv.weight" in sd:
                blk["downsample"] = {
                    "conv": _conv(sd, f"{pre}.downsample.conv"),
                    "norm": _groupnorm(sd, f"{pre}.downsample.norm"),
                }
            blocks.append(blk)
        stages.append({"blocks": blocks})
    p["stages"] = stages
    return p


def convert_timm_hybrid(sd: Dict, model) -> Dict:
    """timm R50/R26-ViT hybrid state_dict -> baselines.ViTBase16 params
    (hybrid types). Layout: patch_embed.backbone.* (ResNetV2),
    patch_embed.proj (1x1 embed conv), cls_token/pos_embed/blocks/norm/head
    (plain timm ViT)."""
    hybrid = model.hybrid
    vit = convert_vit(sd, hybrid.vit.depth, prefix="", patch_embed=False)
    vit["patch_embed"] = _conv(sd, "patch_embed.proj")
    return {"model": {
        "backbone": convert_resnetv2(sd, hybrid.trunk.layers,
                                     prefix="patch_embed.backbone."),
        "vit": vit,
    }}


def convert_hybrid(sd: Dict, model) -> Dict:
    """HybridModel state_dict -> baselines.HybridModel params
    (model.py:344-412: r18 trunk + 1x1 projection + patch-embed-bypassed
    ViT). The ViT's unused patch_embed weights are dropped."""
    vit = convert_vit(sd, model.vit.depth, prefix="vision_transformer.",
                      patch_embed=False)
    # HybridModel never runs patch_embed; keep our init for tree-structure
    # compatibility if present in the target model.
    return {
        "backbone": convert_resnet(sd, 18, prefix="resnet_projector."),
        "projection": _convert_projection(sd, ["3"]),
        "vit": vit,
    }


def convert_resnet50_fc(sd: Dict) -> Dict:
    """ResNet50withFC state_dict (the SSL linear-probe baseline,
    resnet50ssl.py:104-123: `resnet_trunk.*` trunk + `fc.*` head) ->
    models/resnet.ResNet50withFC params. Bare trunk layouts (keys without
    the resnet_trunk. attribute prefix) convert too."""
    prefix = ("resnet_trunk."
              if any(k.startswith("resnet_trunk.") for k in sd) else "")
    return {"trunk": convert_resnet(sd, 50, prefix=prefix),
            "fc": _linear(sd, "fc")}


def convert_for_family(sd: Dict, model, family: str) -> Dict:
    """One dispatch for every runnable config family -> full param tree.
    Shared by CLI serving (--torch=) and warm-start fine-tuning
    (--train.init_from)."""
    if family == "duoformer":
        return convert_duoformer(sd, model)
    if family == "duoformer_legacy":
        return convert_duoformer_legacy(sd, model)
    if family == "hybrid":
        return convert_hybrid(sd, model)
    if family == "vit":
        if model.hybrid is not None:
            return convert_timm_hybrid(sd, model)
        # plain ViT: tolerate both bare timm keys and the reference
        # wrapper's attribute prefix
        prefix = "model." if any(k.startswith("model.") for k in sd) else ""
        return {"model": convert_vit(sd, model.vit.depth, prefix=prefix)}
    if family == "resnet50_fc":
        return convert_resnet50_fc(sd)
    raise ValueError(
        f"torch-checkpoint conversion supports the duoformer/hybrid/vit/"
        f"resnet50_fc families, not family={family!r}")


def inert_paths(model, family: str):
    """Param subtrees the family's forward NEVER touches but init
    creates: a converted checkpoint may legitimately lack them, and
    warm-start keeps the fresh values there. HybridModel bypasses the
    ViT patch embed entirely (model.py:371-383: tokens come from the
    r18 projection), so convert_hybrid drops those weights."""
    if family == "hybrid":
        return (("vit", "patch_embed"),)
    return ()


def head_path(model, family: str):
    """Classifier-head subtree path per family (reinit_head class
    transfer in train.warm_start_params)."""
    if family in ("duoformer", "duoformer_legacy"):
        return ("transformer", "head")
    if family == "hybrid":
        return ("vit", "head")
    if family == "vit":
        return (("model", "vit", "head") if model.hybrid is not None
                else ("model", "head"))
    if family == "resnet50_fc":
        return ("fc",)
    raise ValueError(f"no head path for family {family!r}")


def load_pretrained_backbone(params: Dict, sd: Dict, depth: int = 50,
                             prefix: str = "") -> Dict:
    """Replace the backbone subtree of a full model param tree with
    converted torch weights (torchvision ImageNet or lunit-io SSL trunks,
    resnet50ssl.py:48-57; the weight files must be provided locally —
    this environment has no network egress)."""
    out = dict(params)
    out["backbone"] = convert_resnet(sd, depth, prefix)
    return out


def convert_duoformer(sd: Dict, model) -> Dict:
    """Full state_dict of MyModel_no_extra_params -> DuoFormer params.

    `model` is a models.duoformer.DuoFormer instance (provides static
    config: depth, stages, scale_token mode, backbone depth)."""
    depth = {"r18": 18}.get(model.backbone_name, 50)
    p = {
        "backbone": convert_resnet(sd, depth, prefix="resnet_projector."),
        "projection": _convert_projection(sd, model.projection.stages),
        "transformer": convert_multiscale_former(sd, model.transformer.depth),
    }
    if model.scale_token == "random":
        p["scale_token"] = _t(sd["channel_token"])
    else:
        p["channel_proj"] = _convert_channel_proj(sd)
    return p


def convert_duoformer_legacy(sd: Dict, model) -> Dict:
    """Full state_dict of MyModel -> DuoFormerLegacy params."""
    return {
        "backbone": convert_resnet(sd, 50, prefix="resnet_projector."),
        "projection": _convert_projection(sd, model.projection.stages),
        "channel_proj": _convert_channel_proj(sd),
        "transformer": convert_multiscale_transformer(
            sd, model.transformer.depth),
    }


def to_jax(tree, dtype=None):
    """numpy tree -> jnp tree (optionally casting floats)."""
    import jax

    def leaf(x):
        a = jnp.asarray(x)
        if dtype is not None and jnp.issubdtype(a.dtype, jnp.floating):
            a = a.astype(dtype)
        return a

    return jax.tree.map(leaf, tree)


# ---------------------------------------------------------------------------
# Whole-object reference checkpoints (Q14)
# ---------------------------------------------------------------------------

def state_dict_from_reference_checkpoint(path: str) -> Dict:
    """Extract a flat state_dict from the reference's pickled whole-module
    checkpoint (main_toy.py:139-149) without importing the reference.

    Uses a permissive unpickler that materializes unknown classes as
    stubs; torch Modules reconstruct their parameter/buffer dicts through
    __setstate__, which we walk recursively."""
    import io
    import pickle

    import torch

    class _Stub:
        def __setstate__(self, state):
            self.__dict__.update(state if isinstance(state, dict) else {})

        def __getattr__(self, name):
            raise AttributeError(name)

    class _PermissiveUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                return type(name, (_Stub,), {"__module__": module})

    try:
        obj = torch.load(path, map_location="cpu", weights_only=False,
                         pickle_module=pickle)
    except Exception:
        with open(path, "rb") as f:
            obj = _PermissiveUnpickler(io.BytesIO(f.read())).load()

    model = obj["model"] if isinstance(obj, dict) and "model" in obj else obj
    if isinstance(model, dict):
        # already a state_dict (tensor-valued mapping)
        tensorish = {k: v for k, v in model.items()
                     if hasattr(v, "shape") or hasattr(v, "detach")}
        if tensorish and len(tensorish) == len(model):
            return {k: _t(v) for k, v in model.items()}
    if hasattr(model, "state_dict"):
        return {k: _t(v) for k, v in model.state_dict().items()}

    # stub path: walk _parameters/_buffers/_modules
    flat = {}

    def walk(mod, prefix=""):
        d = getattr(mod, "__dict__", {})
        for k, v in d.get("_parameters", {}).items():
            if v is not None:
                flat[prefix + k] = _t(v)
        for k, v in d.get("_buffers", {}).items():
            if v is not None:
                flat[prefix + k] = _t(v)
        for k, v in d.get("_modules", {}).items():
            walk(v, f"{prefix}{k}.")

    walk(model)
    return flat
