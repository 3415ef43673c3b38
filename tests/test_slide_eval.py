"""Nested class/slide/tiles image-folder layout (one directory per WSI)
and labeled slide-level evaluation: tiles carry their group through
open_dataset_eval, and cli eval aggregates mean tile probabilities per
slide into a slide-level accuracy (reference evaluates per-tile only)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from duoformer_tcga_tpu import cli  # noqa: E402
from duoformer_tcga_tpu.data import folder as folder_lib  # noqa: E402


def _write_tiles(root, layout):
    """layout: {relative_dir: n_tiles}"""
    from PIL import Image

    rng = np.random.default_rng(0)
    for rel, n in layout.items():
        d = os.path.join(root, rel)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"t{i}.png"))


def test_nested_layout_scanned_with_groups(tmp_path):
    root = str(tmp_path / "ds")
    _write_tiles(root, {"classA/slide1": 3, "classA/slide2": 2,
                        "classB/slide3": 4, "classB": 1})
    ds = folder_lib.ImageFolderDataset(root, size=32)
    assert len(ds.samples) == 10
    assert ds.num_classes == 2
    assert ds.class_to_idx == {"classA": 0, "classB": 1}
    # direct tiles keep the class group; nested tiles get class/slide
    assert sorted(set(ds.groups)) == [
        "classA/slide1", "classA/slide2", "classB", "classB/slide3"]
    # labels follow the CLASS directory, not the slide
    for (_, label), g in zip(ds.samples, ds.groups):
        assert label == ds.class_to_idx[g.split("/")[0]]


def test_flat_layout_unchanged(tmp_path):
    root = str(tmp_path / "flat")
    _write_tiles(root, {"classA": 2, "classB": 3})
    ds = folder_lib.ImageFolderDataset(root, size=32)
    assert len(ds.samples) == 5
    assert set(ds.groups) == {"classA", "classB"}


def test_eval_stream_carries_groups(tmp_path):
    root = str(tmp_path / "ds")
    _write_tiles(root, {"classA/slide1": 3, "classB/slide2": 2})
    batches = list(folder_lib.open_dataset_eval(root, 4, num_classes=2,
                                                size=32))
    assert [len(b["group"]) for b in batches] == [4, 1]
    assert batches[0]["valid"] == 4 and batches[1]["valid"] == 1
    flat = [g for b in batches for g in b["group"]]
    assert flat == ["classA/slide1"] * 3 + ["classB/slide2"] * 2


def test_cli_eval_reports_slide_accuracy(tmp_path, capsys):
    root = str(tmp_path / "ds")
    _write_tiles(root, {"classA/slide1": 3, "classA/slide2": 2,
                        "classB/slide3": 4})
    report = str(tmp_path / "eval.json")
    rc = cli.main([
        "eval", "--preset=release-2scale", "--model.depth=1",
        "--model.embed_dim=96", "--model.proj_dim=96",
        "--model.dtype=float32", "--train.platform=cpu",
        "--train.batch_size=8", f"--train.eval_dataset={root}",
        f"--train.checkpoint_dir={tmp_path}/ck", f"--report={report}",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "slides: " in out
    rep = json.load(open(report))
    assert rep["n"] == 9                      # every tile counted
    assert rep["slides"]["n"] == 3            # every slide counted
    assert 0.0 <= rep["slides"]["accuracy"] <= 1.0
    assert rep["slides"]["correct"] <= 3
    assert 0.0 <= rep["slides"]["roc_auc_ovr"] <= 1.0
    assert 0.0 <= rep["slides"]["macro_f1"] <= 1.0
    per = rep["slides"]["per_slide"]
    assert set(per) == {"classA/slide1", "classA/slide2", "classB/slide3"}
    assert per["classA/slide1"]["n_tiles"] == 3
    assert per["classB/slide3"]["label"] == 1
    assert abs(sum(per["classA/slide2"]["mean_probs"]) - 1.0) < 1e-3


def test_mixed_layout_warns(tmp_path):
    """Direct tiles + image subdirs in one class dir is usually an
    accident (thumbnails/ etc. silently joining the class) — warn."""
    import warnings

    root = str(tmp_path / "mix")
    _write_tiles(root, {"classA": 2, "classA/thumbs": 1, "classB": 2})
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        folder_lib.ImageFolderDataset(root, size=32)
    assert any("mixes direct tiles" in str(w.message) for w in rec)
