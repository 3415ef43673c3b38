"""Warm-start training: --train.init_from (fine-tune a reference torch
checkpoint, the Checkpoint1/2 workflow) and --train.init_backbone (graft
pretrained trunk weights, the reference's pretrained=True path,
resnet50ssl.py:48-79). Resume from checkpoint_dir always wins over a
warm start (tested via the CLI)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from torch_oracle import (OracleDuoFormer, OracleDuoFormerLegacy,  # noqa: E402
                          OracleResNetTrunk)

from duoformer_tcga_tpu import config as config_lib  # noqa: E402
from duoformer_tcga_tpu import train as train_lib  # noqa: E402
from duoformer_tcga_tpu.utils import torch_convert as tc  # noqa: E402


def _tiny_model(num_classes=2):
    mc = config_lib.ModelConfig(depth=1, embed_dim=96, proj_dim=96,
                                num_classes=num_classes, dtype="float32")
    model = mc.build()
    fresh = model.init(jax.random.PRNGKey(0))
    return model, fresh


def _oracle_ckpt(tmp_path, num_classes=2, seed=0, name="ck.pth"):
    torch.manual_seed(seed)
    om = OracleDuoFormer(depth=1, embed_dim=96, num_classes=num_classes,
                         proj_dim=96)
    om.eval()
    path = str(tmp_path / name)
    torch.save({"model": om.state_dict()}, path)
    return om, path


def _leaves_equal(a, b):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(fa, fb))


def test_init_from_matches_converter(tmp_path):
    model, fresh = _tiny_model()
    om, path = _oracle_ckpt(tmp_path)
    got = train_lib.warm_start_params(model, fresh, init_from=path)
    want = tc.to_jax(tc.convert_duoformer(om.state_dict(), model))
    assert _leaves_equal(got, want)


def test_init_from_legacy_family(tmp_path):
    # the legacy-channel preset's regularization: attn_drop 0.1 creates
    # the Q9 qk-norm params the oracle checkpoint carries
    mc = config_lib.ModelConfig(family="duoformer_legacy", depth=1,
                                embed_dim=96, proj_dim=96, num_classes=2,
                                init_values=1e-5, attn_drop_rate=0.1,
                                proj_drop_rate=0.1, dtype="float32")
    model = mc.build()
    fresh = model.init(jax.random.PRNGKey(0))
    torch.manual_seed(7)
    om = OracleDuoFormerLegacy(depth=1, embed_dim=96, num_classes=2,
                               proj_dim=96)
    om.eval()
    path = str(tmp_path / "legacy.pth")
    torch.save({"model": om.state_dict()}, path)
    got = train_lib.warm_start_params(model, fresh, init_from=path,
                                      family="duoformer_legacy")
    want = tc.to_jax(tc.convert_duoformer_legacy(om.state_dict(), model))
    assert _leaves_equal(got, want)


def test_init_from_head_mismatch_requires_reinit(tmp_path):
    model, fresh = _tiny_model(num_classes=2)
    om, path = _oracle_ckpt(tmp_path, num_classes=5)
    with pytest.raises(ValueError, match="reinit_head"):
        train_lib.warm_start_params(model, fresh, init_from=path)
    got = train_lib.warm_start_params(model, fresh, init_from=path,
                                      reinit_head=True)
    # head comes from the fresh init (new class count), rest from the ckpt
    assert _leaves_equal(got["transformer"]["head"],
                         fresh["transformer"]["head"])
    assert _leaves_equal(got["backbone"],
                         tc.convert_resnet(om.state_dict(), 50,
                                           prefix="resnet_projector."))


def test_init_from_architecture_mismatch_errors(tmp_path):
    # depth-2 model vs depth-1 checkpoint: the converter indexes blocks
    # that don't exist -> loud failure, not a silent partial load
    mc = config_lib.ModelConfig(depth=2, embed_dim=96, proj_dim=96,
                                dtype="float32")
    model = mc.build()
    fresh = model.init(jax.random.PRNGKey(0))
    _, path = _oracle_ckpt(tmp_path)
    with pytest.raises(Exception):
        train_lib.warm_start_params(model, fresh, init_from=path)


def test_init_backbone_grafts_trunk(tmp_path):
    model, fresh = _tiny_model()
    torch.manual_seed(3)
    trunk = OracleResNetTrunk(50)
    path = str(tmp_path / "trunk.torch")
    torch.save(trunk.state_dict(), path)
    got = train_lib.warm_start_params(model, fresh, init_backbone=path)
    assert _leaves_equal(got["backbone"],
                         tc.convert_resnet(trunk.state_dict(), 50))
    # everything outside the trunk is the fresh init
    assert _leaves_equal(got["transformer"], fresh["transformer"])
    assert _leaves_equal(got["projection"], fresh["projection"])


def test_init_backbone_wrong_depth_errors(tmp_path):
    model, fresh = _tiny_model()
    torch.manual_seed(4)
    trunk = OracleResNetTrunk(18)
    path = str(tmp_path / "trunk18.torch")
    torch.save(trunk.state_dict(), path)
    with pytest.raises(Exception):
        train_lib.warm_start_params(model, fresh, init_backbone=path)


def test_cli_train_warm_start_and_resume_precedence(tmp_path, capsys):
    from duoformer_tcga_tpu import cli

    _, path = _oracle_ckpt(tmp_path)
    args = [
        "train", "--preset=release-2scale", "--model.depth=1",
        "--model.embed_dim=96", "--model.proj_dim=96",
        "--model.dtype=float32", "--train.platform=cpu",
        "--train.batch_size=8", "--steps=1",
        "--train.dataset=synthetic",
        f"--train.checkpoint_dir={tmp_path}/ck",
        f"--train.init_from={path}",
    ]
    cli.main(args)
    out = capsys.readouterr().out
    assert "warm start from" in out
    # second run: the saved resume checkpoint wins over the warm start
    cli.main([a if not a.startswith("--steps=") else "--steps=2"
              for a in args])
    out = capsys.readouterr().out
    assert "resumed from step 1" in out
    assert "warm start" not in out


def test_reinit_head_applies_even_when_shapes_match(tmp_path):
    """--train.reinit_head must replace the head unconditionally (same
    class COUNT, different task), not only on a shape mismatch."""
    model, fresh = _tiny_model(num_classes=2)
    om, path = _oracle_ckpt(tmp_path, num_classes=2, seed=9)
    got = train_lib.warm_start_params(model, fresh, init_from=path,
                                      reinit_head=True)
    assert _leaves_equal(got["transformer"]["head"],
                         fresh["transformer"]["head"])
    loaded = tc.to_jax(tc.convert_duoformer(om.state_dict(), model))
    assert not _leaves_equal(got["transformer"]["head"],
                             loaded["transformer"]["head"])


def test_cli_unfrozen_finetune_from_pretrained_trunk(tmp_path, capsys):
    """The reference's real pretrained=True workflow: graft SSL trunk
    weights, then fine-tune the WHOLE network (unfrozen backbone =
    bn_stats running-stat threading) — warm start and bn_stats compose."""
    from duoformer_tcga_tpu import cli

    torch.manual_seed(11)
    trunk = OracleResNetTrunk(50)
    path = str(tmp_path / "trunk.torch")
    torch.save(trunk.state_dict(), path)
    cli.main([
        "train", "--preset=release-2scale", "--model.depth=1",
        "--model.embed_dim=96", "--model.proj_dim=96",
        "--model.dtype=float32", "--train.platform=cpu",
        "--train.batch_size=8", "--steps=2", "--train.dataset=synthetic",
        "--model.freeze_backbone=false",
        f"--train.checkpoint_dir={tmp_path}/ck",
        f"--train.init_backbone={path}",
    ])
    out = capsys.readouterr().out
    assert "warm start from" in out
    assert "training done" in out
