"""duoformer_tcga_tpu — TPU-native (JAX/XLA/Pallas) DuoFormer framework.

A from-scratch rebuild of the capabilities of AliSerwat/duoformer_TCGA
(MIDL 2025 histopathology multi-scale transformer) designed TPU-first:
NHWC/XLA convolutions, scan-compiled transformer stacks, fused attention
kernels, pjit/Mesh data parallelism.

Factory API mirrors the reference's models/__init__.py:12-80, with the
reference's constructor bugs fixed (its build_model call chain raises
NameError/TypeError as shipped — SURVEY.md Q2/Q3; its release-variant
ctor passes kwargs MultiscaleFormer rejects). Defaults here are the
*working* main_toy.py:58-82 configuration, not the broken signature
defaults (embed_dim must equal proj_dim for the token concat to
type-check).
"""

__version__ = "0.1.0"

import jax.numpy as jnp

from .models import (  # noqa: F401
    DuoFormer,
    DuoFormerLegacy,
    MultiscaleFormer,
    MultiscaleTransformer,
    ResNet50withFC,
    ResNetBackbone,
    ScaleFormer,
    count_parameters,
)
from .models.duoformer import fold_for_inference  # noqa: F401


def __getattr__(name):
    # lazy submodule access: dft.config, dft.inference, dft.train, ...
    import importlib
    if name in ("config", "inference", "train", "data", "parallel", "utils"):
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)


def build_model_no_extra_params(
    depth=12, embed_dim=768, num_heads=12, num_classes=2, num_layers=2,
    num_patches=49, proj_dim=768, mlp_ratio=4.0, attn_drop_rate=0.0,
    proj_drop_rate=0.0, freeze_backbone=True, backbone="r50",
    scale_token="random", patch_attn=True, remat=False,
    apply_fc_norm=False, dtype=jnp.float32,
):
    """Release-variant DuoFormer (reference build_model_no_extra_params,
    models/__init__.py:40-70)."""
    return DuoFormer(
        depth=depth, embed_dim=embed_dim, num_heads=num_heads,
        num_classes=num_classes, num_layers=num_layers,
        num_patches=num_patches, mlp_ratio=mlp_ratio,
        attn_drop_rate=attn_drop_rate, proj_drop_rate=proj_drop_rate,
        apply_fc_norm=apply_fc_norm,
        proj_dim=proj_dim, freeze_backbone=freeze_backbone,
        backbone=backbone, scale_token=scale_token, patch_attn=patch_attn,
        remat=remat, dtype=dtype)


def build_hybrid(num_classes=100, num_blocks=12, proj_dim=768, num_heads=12,
                 dtype=jnp.float32):
    """ResNet+ViT ablation baseline (reference build_hybrid,
    models/__init__.py:73-80)."""
    from .models.baselines import HybridModel

    return HybridModel(num_classes=num_classes, num_blocks=num_blocks,
                       proj_dim=proj_dim, num_heads=num_heads, dtype=dtype)


def build_model(
    depth=12, embed_dim=768, num_heads=12, init_values=1e-5, num_classes=2,
    num_layers=2, proj_dim=768, pretrained=True, freeze=True,
    remat=False, dtype=jnp.float32,
):
    """Channel-token DuoFormer with the inherited-ViT core (reference
    build_model, models/__init__.py:12-37 -> MyModel). remat=True
    rematerializes blocks in the backward — the legacy family's active
    attention dropout + LayerScale keep it on the XLA attention path,
    whose saved activations otherwise exceed HBM at large batches."""
    return DuoFormerLegacy(
        depth=depth, embed_dim=embed_dim, num_heads=num_heads,
        num_classes=num_classes, num_layers=num_layers, proj_dim=proj_dim,
        init_values=init_values, freeze=freeze,
        pretrained_backbone=pretrained, remat=remat, dtype=dtype)
