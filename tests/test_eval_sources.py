"""cli eval weight sources: --torch= (evaluate a reference torch
checkpoint on a labeled split — the evaluate-Checkpoint1/2 workflow) and
--params= (evaluate an exported bf16 serving artifact). Shares
_weights_for_serving with predict, so the predict refactor is covered
too."""

import os
import sys

import pytest
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from torch_oracle import OracleDuoFormer  # noqa: E402

from duoformer_tcga_tpu import cli  # noqa: E402

TINY = [
    "--preset=release-2scale", "--model.depth=1", "--model.embed_dim=96",
    "--model.proj_dim=96", "--model.dtype=float32", "--train.platform=cpu",
    "--train.batch_size=8", "--train.dataset=synthetic",
]


def _oracle_ckpt(tmp_path, num_classes=2):
    torch.manual_seed(0)
    om = OracleDuoFormer(depth=1, embed_dim=96, num_classes=num_classes,
                         proj_dim=96)
    om.eval()
    path = str(tmp_path / "ck.pth")
    torch.save({"model": om.state_dict()}, path)
    return path


def test_eval_torch_checkpoint(tmp_path, capsys):
    path = _oracle_ckpt(tmp_path)
    report = str(tmp_path / "eval.json")
    rc = cli.main(["eval"] + TINY + [f"--train.checkpoint_dir={tmp_path}/ck",
                                     f"--torch={path}",
                                     f"--report={report}"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "evaluating with converted torch checkpoint" in out
    assert "eval: acc=" in out
    # confusion matrix: 2 classes -> 2 rows, entries sum to n
    assert "confusion matrix" in out
    rows = [l for l in out.splitlines()
            if l.startswith("  ") and l.strip().replace(" ", "").isdigit()]
    n = int(out.split("n=", 1)[1].split()[0])
    assert sum(int(v) for r in rows[-2:] for v in r.split()) == n
    # --report JSON agrees with the printed metrics
    import json
    rep = json.load(open(report))
    assert rep["n"] == n
    assert abs(rep["accuracy"]
               - float(out.split("acc=", 1)[1].split()[0])) < 1e-4
    assert np_sum(rep["confusion_matrix"]) == n
    assert sum(rep["per_class_count"]) == n


def np_sum(mat):
    return sum(v for row in mat for v in row)


def test_eval_exported_artifact(tmp_path, capsys):
    ckdir = f"{tmp_path}/ck"
    cli.main(["train", "--steps=1"] + TINY
             + [f"--train.checkpoint_dir={ckdir}"])
    art = str(tmp_path / "model.npz")
    cli.main(["export"] + TINY + [f"--train.checkpoint_dir={ckdir}",
                                  f"--output={art}"])
    capsys.readouterr()
    rc = cli.main(["eval"] + TINY + [f"--train.checkpoint_dir={ckdir}",
                                     f"--params={art}"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "evaluating with exported artifact" in out
    assert "eval: acc=" in out


def test_eval_rejects_both_sources(tmp_path):
    path = _oracle_ckpt(tmp_path)
    with pytest.raises(ValueError, match="at most one"):
        cli.main(["eval"] + TINY + [f"--train.checkpoint_dir={tmp_path}/ck",
                                    f"--torch={path}", "--params=x.npz"])


def test_eval_rejects_quantized_artifact(tmp_path):
    ckdir = f"{tmp_path}/ck"
    cli.main(["train", "--steps=1"] + TINY
             + [f"--train.checkpoint_dir={ckdir}"])
    art = str(tmp_path / "model_q.npz")
    cli.main(["export", "--quantize"] + TINY
             + [f"--train.checkpoint_dir={ckdir}", f"--output={art}"])
    with pytest.raises(ValueError, match="int8"):
        cli.main(["eval"] + TINY + [f"--train.checkpoint_dir={ckdir}",
                                    f"--params={art}"])


def test_eval_torch_mismatched_family_fails_loudly(tmp_path):
    """--torch= now converts every runnable family (duoformer/hybrid/
    vit/resnet50_fc — tests/test_torch_serving.py), so feeding a
    DUOFORMER checkpoint to a vit-family eval must fail loudly inside
    the vit converter (missing keys), not serve garbage."""
    path = _oracle_ckpt(tmp_path)
    with pytest.raises((KeyError, ValueError)):
        cli.main(["eval", "--preset=vit-baseline", "--model.dtype=float32",
                  "--train.platform=cpu", "--train.batch_size=8",
                  "--train.dataset=synthetic",
                  f"--train.checkpoint_dir={tmp_path}/ck",
                  f"--torch={path}"])
