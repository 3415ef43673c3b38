"""K-fold cross-validation: deterministic slide-level stratified fold
split (fold_indices — tiles from one slide never straddle a fold),
--train.fold plumbing through the train/eval streams, and the
`cli crossval` driver (the DuoFormer paper's evaluation protocol; the
reference repo has no driver for it)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from duoformer_tcga_tpu import cli  # noqa: E402
from duoformer_tcga_tpu.data import folder as folder_lib  # noqa: E402


def _nested(tmp_path, layout):
    from PIL import Image

    rng = np.random.default_rng(0)
    root = str(tmp_path / "ds")
    for rel, n in layout.items():
        d = os.path.join(root, rel)
        os.makedirs(d)
        for i in range(n):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                         dtype=np.uint8)).save(
                os.path.join(d, f"t{i}.png"))
    return root


LAYOUT = {"a/s1": 3, "a/s2": 2, "a/s3": 4, "a/s4": 3,
          "b/s5": 2, "b/s6": 5, "b/s7": 3, "b/s8": 2}


def test_fold_split_partitions_by_slide(tmp_path):
    root = _nested(tmp_path, LAYOUT)
    ds = folder_lib.ImageFolderDataset(root, size=None)
    n = len(ds.samples)
    seen_val = set()
    for k in range(2):
        train, val = folder_lib.fold_indices(root, k, 2, 2)
        # exact partition per fold
        assert sorted(np.concatenate([train, val]).tolist()) == list(range(n))
        # slides never straddle the split
        tg = {ds.groups[i] for i in train}
        vg = {ds.groups[i] for i in val}
        assert not (tg & vg)
        # stratified: both classes present on both sides (4 slides each)
        assert {g.split("/")[0] for g in tg} == {"a", "b"}
        assert {g.split("/")[0] for g in vg} == {"a", "b"}
        seen_val.update(val.tolist())
        # deterministic
        t2, v2 = folder_lib.fold_indices(root, k, 2, 2)
        assert np.array_equal(train, t2) and np.array_equal(val, v2)
    # every sample is validated in exactly one fold
    assert seen_val == set(range(n))


def test_fold_split_hdf5_uses_provenance(tmp_path):
    import h5py

    rng = np.random.default_rng(1)
    path = str(tmp_path / "t.h5")
    with h5py.File(path, "w") as f:
        f["images"] = rng.integers(0, 255, (12, 8, 8, 3), np.uint8)
        f["labels"] = np.asarray([0] * 6 + [1] * 6, np.int32)
        f["slide_ids"] = np.asarray([0] * 3 + [1] * 3 + [2] * 3 + [3] * 3,
                                    np.int32)
        f.attrs["slide_names"] = json.dumps(["w", "x", "y", "z"])
    train, val = folder_lib.fold_indices(path, 0, 2, 2)
    sids = np.asarray([0] * 3 + [1] * 3 + [2] * 3 + [3] * 3)
    assert not (set(sids[train]) & set(sids[val]))
    assert len(train) + len(val) == 12


def test_fold_streams_are_complementary(tmp_path):
    import itertools

    root = _nested(tmp_path, LAYOUT)
    train, val = folder_lib.fold_indices(root, 1, 2, 2)
    ds = folder_lib.ImageFolderDataset(root, size=32)
    # one epoch of the train stream (batch 1 avoids batch-drop) covers
    # exactly the train-side label multiset
    it = folder_lib.open_dataset(root, 1, num_classes=2, size=32,
                                 fold=(1, 2))
    got = sorted(int(b["label"][0])
                 for b in itertools.islice(it, len(train)))
    want = sorted(ds.samples[i][1] for i in train)
    assert got == want
    # the eval stream covers exactly the val side
    n_val = sum(b["valid"]
                for b in folder_lib.open_dataset_eval(root, 4, num_classes=2,
                                                      size=32, fold=(1, 2)))
    assert n_val == len(val)


def test_fold_on_synthetic_is_loud():
    with pytest.raises(ValueError, match="real dataset"):
        folder_lib.open_dataset("synthetic", 4, fold=(0, 2))


def test_cli_crossval_end_to_end(tmp_path, capsys):
    root = _nested(tmp_path, LAYOUT)
    report = str(tmp_path / "cv.json")
    rc = cli.main([
        "crossval", "--preset=release-2scale", "--model.depth=1",
        "--model.embed_dim=96", "--model.proj_dim=96",
        "--model.dtype=float32", "--train.platform=cpu",
        "--train.batch_size=8", "--steps=1", "--folds=2",
        f"--train.dataset={root}",
        f"--train.checkpoint_dir={tmp_path}/cv",
        f"--report={report}",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "=== fold 0/2 ===" in out and "=== fold 1/2 ===" in out
    assert "crossval (2 folds): acc" in out
    rep = json.load(open(report))
    assert rep["folds"] == 2 and len(rep["per_fold_accuracy"]) == 2
    assert 0.0 <= rep["mean_accuracy"] <= 1.0
    # per-fold checkpoints exist
    assert os.path.isdir(f"{tmp_path}/cv/fold0")
    assert os.path.isdir(f"{tmp_path}/cv/fold1")


def test_fold_split_flat_layout_tile_level(tmp_path):
    """Flat class/tiles folders have no slide provenance: each tile is
    its own group, so the split is stratified tile-level instead of one
    indivisible group per class (which made every fold degenerate)."""
    from PIL import Image

    rng = np.random.default_rng(3)
    root = str(tmp_path / "flat")
    for c, n in {"a": 6, "b": 4}.items():
        os.makedirs(os.path.join(root, c))
        for i in range(n):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                         dtype=np.uint8)).save(
                os.path.join(root, c, f"t{i}.png"))
    for k in range(2):
        train, val = folder_lib.fold_indices(root, k, 2, 2)
        assert len(train) and len(val)
        assert len(train) + len(val) == 10


def test_crossval_rejects_single_fold(tmp_path):
    from duoformer_tcga_tpu import config as config_lib

    cfg = config_lib.Config()
    with pytest.raises(ValueError, match="at least 2"):
        cli.cmd_crossval(cfg, folds=1)
