"""Typed configuration for the full DuoFormer variant matrix.

The reference scatters hyperparameters across constructor signatures and
`main()` locals (/root/reference/main_toy.py:58-82, models/__init__.py:12-70)
with mutually inconsistent defaults (its factory defaults embed_dim=256 vs
proj_dim=384 cannot even broadcast). This module replaces that with one
dataclass pair whose defaults are the *working* release configuration, plus
named presets for every row of the SURVEY §2 variant matrix, and CLI
override support (`--key=value` / `key=value`).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp


@dataclass
class ModelConfig:
    # architecture family: "duoformer" (release, MyModel_no_extra_params),
    # "duoformer_legacy" (MyModel), "hybrid" (HybridModel), "vit" (ViTBase16),
    # "resnet50_fc" (SSL linear probe), "scaleformer" (scale-attn-only)
    family: str = "duoformer"
    depth: int = 12
    embed_dim: int = 768
    proj_dim: int = 768
    num_heads: int = 12
    num_classes: int = 2
    num_layers: int = 2            # pyramid scales in {1,2,3,4}
    num_patches: int = 49
    mlp_ratio: float = 4.0
    attn_drop_rate: float = 0.0
    proj_drop_rate: float = 0.0
    init_values: Optional[float] = None   # LayerScale (1e-5 in legacy)
    backbone: str = "r50"          # r50 | r18 | r50_Swav
    scale_token: str = "random"    # random | channel
    patch_attn: bool = True
    freeze_backbone: bool = True
    # Q7 fix, opt-in (release family only): apply fc_norm to the CLS
    # before the head instead of discarding it — makes FROM-SCRATCH
    # full-size training feasible (see MultiscaleFormer.__init__);
    # default False = bit-faithful reference behavior
    apply_fc_norm: bool = False
    remat: bool = False            # activation rematerialization in stacks
    dtype: str = "bfloat16"        # compute dtype; params stay float32

    def build(self):
        import duoformer_tcga_tpu as dft
        from .models.baselines import HybridModel, ViTBase16
        from .models.resnet import ResNet50withFC

        d = getattr(jnp, self.dtype)
        if self.family == "duoformer":
            return dft.DuoFormer(
                depth=self.depth, embed_dim=self.embed_dim,
                num_heads=self.num_heads, num_classes=self.num_classes,
                num_layers=self.num_layers, num_patches=self.num_patches,
                mlp_ratio=self.mlp_ratio,
                attn_drop_rate=self.attn_drop_rate,
                proj_drop_rate=self.proj_drop_rate, proj_dim=self.proj_dim,
                freeze_backbone=self.freeze_backbone, backbone=self.backbone,
                scale_token=self.scale_token, patch_attn=self.patch_attn,
                init_values=self.init_values, remat=self.remat,
                apply_fc_norm=self.apply_fc_norm, dtype=d)
        if self.family == "duoformer_legacy":
            return dft.DuoFormerLegacy(
                depth=self.depth, embed_dim=self.embed_dim,
                num_heads=self.num_heads, num_classes=self.num_classes,
                num_layers=self.num_layers, proj_dim=self.proj_dim,
                init_values=self.init_values, freeze=self.freeze_backbone,
                attn_drop_rate=self.attn_drop_rate,
                drop_rate=self.proj_drop_rate, remat=self.remat, dtype=d)
        if self.family == "hybrid":
            return HybridModel(num_classes=self.num_classes,
                               num_blocks=self.depth, proj_dim=self.proj_dim,
                               num_heads=self.num_heads, dtype=d)
        if self.family == "vit":
            return ViTBase16(n_classes=self.num_classes, dtype=d)
        if self.family == "resnet50_fc":
            return ResNet50withFC(num_classes=self.num_classes, dtype=d)
        if self.family == "scaleformer":
            from .models.transformer import ScaleFormer
            return ScaleFormer(depth=self.depth, scales=self.num_layers,
                               num_heads=self.num_heads,
                               embed_dim=self.embed_dim, dtype=d)
        raise ValueError(f"unknown model family: {self.family}")


@dataclass
class TrainConfig:
    batch_size: int = 128          # main_toy.py:59 (2-scale setting)
    epochs: int = 50
    lr: float = 1e-4               # main_toy.py:66: 1e-4 for 2-scale
    # LR schedule: "onecycle" (reference, main_toy.py:112) | "cosine"
    # (5% linear warmup then cosine to 0) | "constant"
    schedule: str = "onecycle"
    # optimizer: "adam" (reference, main_toy.py:111, torch L2-decay
    # semantics) | "adamw" (decoupled decay) | "sgd" (momentum buffer);
    # all torch-parity-tested (tests/test_optimizers.py)
    optimizer: str = "adam"
    momentum: float = 0.9          # sgd only
    weight_decay: float = 1e-4
    # training regularizers beyond the reference (all off by default =
    # reference semantics): smoothed-target CE, Beta(alpha,alpha) batch
    # mixup, and parameter EMA (decay per step; eval/export prefer the
    # EMA weights when enabled)
    label_smoothing: float = 0.0
    mixup: float = 0.0
    ema: float = 0.0
    seed: int = 0
    steps_per_epoch: Optional[int] = None
    checkpoint_dir: str = "./checkpoints"
    checkpoint_every: int = 1000   # steps
    keep_checkpoints: int = 3
    log_every: int = 50
    model_parallel: int = 1
    dcn_slices: int = 1            # multi-slice DP: leading "dcn" mesh axis
    accum_steps: int = 1           # gradient accumulation (microbatches)
    # device-side train-time augmentation (data.pipeline.augment_tiles):
    # "none" (reference semantics) or "d4" (per-sample dihedral transform);
    # jitter>0 adds per-sample brightness/contrast on normalized values
    augment: str = "none"
    jitter: float = 0.0
    # held-out eval source; None = a reshuffled pass over `dataset`
    eval_dataset: Optional[str] = None
    dataset: str = "synthetic"
    # warm start (fresh runs only — a resume checkpoint in checkpoint_dir
    # always wins): init_from = a reference torch checkpoint (state_dict
    # or the Q14 whole-object pickle, main_toy.py:139-149) converted to
    # the full param tree — the fine-tune-Checkpoint1/2 workflow;
    # reinit_head replaces the loaded classifier head with the fresh
    # init (class-count transfer). init_backbone = lunit-io SSL registry
    # key (BT/MoCoV2/SwAV; cached file required, no egress here) or a
    # local torch weights path grafted into the backbone subtree — the
    # reference's pretrained=True path (resnet50ssl.py:48-79).
    init_from: Optional[str] = None
    reinit_head: bool = False
    init_backbone: Optional[str] = None
    # per-class loss weights for imbalanced datasets: "auto"
    # (inverse-frequency from the training split) or comma floats
    # ("1.0,2.5"); None = unweighted (reference semantics)
    class_weights: Optional[str] = None
    # cross-validation fold "k/K" (e.g. "0/5"): train on the K-1 train
    # folds of the deterministic slide-level stratified split of
    # `dataset`, eval/gate on the held-out fold (ignores eval_dataset).
    # `cli crossval --folds=K` loops this over every k.
    fold: Optional[str] = None
    # training batch sampler: "shuffle" (uniform per-epoch permutation)
    # or "balanced" (inverse-frequency draws with replacement — the
    # oversampling counterpart to class_weights for imbalanced cohorts)
    sampler: str = "shuffle"
    # early stopping: stop when the epoch-end eval accuracy hasn't
    # improved for this many consecutive epochs (0 = off, the
    # reference's fixed-epoch behavior); the best checkpoint is always
    # kept in <checkpoint_dir>/best either way
    patience: int = 0
    # backend override ("cpu"/"tpu"); None = process default. Needed where
    # a TPU plugin is registered but the CPU backend should run the job.
    platform: Optional[str] = None
    # multi-host pod training: call jax.distributed.initialize() (TPU pod
    # metadata / COORDINATOR_ADDRESS env autodetection) before touching
    # devices; each process then loads its shard of every global batch
    # (data.folder.open_dataset shard=) and PrefetchLoader assembles the
    # global array. Single-host runs ignore it.
    multihost: bool = False


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)


# Named presets — the SURVEY §2 model-variant matrix.
PRESETS = {
    "release-2scale": ModelConfig(),
    "release-2scale-channel": ModelConfig(scale_token="channel"),
    "release-3scale": ModelConfig(num_layers=3),
    "release-4scale": ModelConfig(num_layers=4),
    "release-r18": ModelConfig(backbone="r18"),
    "release-ssl": ModelConfig(backbone="r50_Swav"),
    "legacy-channel": ModelConfig(family="duoformer_legacy",
                                  init_values=1e-5, attn_drop_rate=0.1,
                                  proj_drop_rate=0.1),
    "hybrid-baseline": ModelConfig(family="hybrid", num_classes=100),
    "vit-baseline": ModelConfig(family="vit", num_classes=100),
    "resnet50-linear-probe": ModelConfig(family="resnet50_fc", num_classes=4),
    "scaleformer-only": ModelConfig(family="scaleformer", embed_dim=384,
                                    num_heads=6),
}


def _coerce(val, typ):
    # `from __future__ import annotations` stringifies field types;
    # resolve via typing.get_type_hints at the call site.
    if typ is bool:
        if val is None:            # bare flag: --model.remat means True
            return True
        if val.lower() in ("1", "true", "yes"):
            return True
        if val.lower() in ("0", "false", "no"):
            return False
        # '' (from --flag=) or a typo must not silently mean False
        raise ValueError(f"boolean flag needs true/false/1/0/yes/no "
                         f"(or no '=value' for true), got {val!r}")
    if val is None:
        raise ValueError(f"non-boolean config field requires =value "
                         f"(type {typ})")
    if typ in (Optional[float], Optional[int], Optional[str]):
        if val.lower() == "none":
            return None
        if typ == Optional[str]:
            return val
        return float(val) if typ == Optional[float] else int(val)
    return typ(val)


def apply_overrides(cfg: Config, overrides) -> Config:
    """Apply "section.key=value" strings (e.g. model.depth=6,
    train.lr=3e-4)."""
    for ov in overrides:
        ov = ov.lstrip("-")
        key, eq, val = ov.partition("=")
        if not eq:
            val = None             # bare flag (bool fields -> True)
        section, _, name = key.partition(".")
        target = getattr(cfg, section)
        if not hasattr(target, name):
            raise KeyError(f"no config field {key}")
        import typing
        hints = typing.get_type_hints(type(target))
        setattr(target, name, _coerce(val, hints[name]))
    return cfg


def from_args(args) -> Config:
    """args: list like ["--preset=release-2scale", "--model.depth=6",
    "--train.lr=1e-4"]."""
    cfg = Config()
    rest = []
    for a in args:
        if a.lstrip("-").startswith("preset="):
            name = a.split("=", 1)[1]
            cfg.model = dataclasses.replace(PRESETS[name])
        else:
            rest.append(a)
    return apply_overrides(cfg, rest)
