"""WSI -> HDF5 dataset building (`cli make-dataset`).

Completes the data tooling loop the reference lacks (quirk Q1: its
dataset module is missing entirely): raw slide planes tile into the
packed HDF5 format hdf5_tiles streams for --train.dataset.
"""

import os

import numpy as np
import pytest

from duoformer_tcga_tpu.data import folder as folder_lib


def _plane(rng, H=96, W=128, blank_rows=0):
    """Synthetic uint8 plane; optionally a constant (background) top band."""
    p = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    if blank_rows:
        p[:blank_rows] = 240
    return p


@pytest.fixture
def slide_dirs(tmp_path):
    rng = np.random.default_rng(0)
    for cls in ("benign", "tumor"):
        d = tmp_path / "slides" / cls
        d.mkdir(parents=True)
        np.save(str(d / f"{cls}_a.npy"), _plane(rng))
    return str(tmp_path / "slides")


def test_discover_slides_classes(slide_dirs):
    pairs = folder_lib.discover_slides(slide_dirs)
    assert [(os.path.basename(p), c) for p, c in pairs] == [
        ("benign_a.npy", 0), ("tumor_a.npy", 1)]


def test_discover_slides_csv_override(slide_dirs, tmp_path):
    csv = tmp_path / "labels.csv"
    csv.write_text("benign_a.npy,3\ntumor_a.npy,1\n")
    pairs = folder_lib.discover_slides(slide_dirs, labels_csv=str(csv))
    assert sorted(c for _, c in pairs) == [1, 3]


def test_discover_slides_empty_is_loud(tmp_path):
    (tmp_path / "empty").mkdir()
    with pytest.raises(FileNotFoundError, match="no slides"):
        folder_lib.discover_slides(str(tmp_path / "empty"))


def test_build_writes_streamable_h5(slide_dirs, tmp_path):
    import h5py

    out = str(tmp_path / "tiles.h5")
    counts = folder_lib.build_hdf5_dataset(
        out, folder_lib.discover_slides(slide_dirs), tile=32)
    # 96x128 plane -> 3x4 grid of 32-tiles per slide
    assert [n for _, n in counts] == [12, 12]
    with h5py.File(out, "r") as f:
        assert f["images"].shape == (24, 32, 32, 3)
        assert f["images"].dtype == np.uint8
        labels = f["labels"][:]
    assert list(labels[:12]) == [0] * 12 and list(labels[12:]) == [1] * 12

    # the training loader streams it directly
    batches = folder_lib.hdf5_tiles(out, 8, epochs=1, num_classes=2)
    got = list(batches)
    assert len(got) == 3
    assert got[0]["image"].shape == (8, 32, 32, 3)


def test_build_records_slide_provenance(slide_dirs, tmp_path):
    import json

    import h5py

    out = str(tmp_path / "tiles.h5")
    folder_lib.build_hdf5_dataset(
        out, folder_lib.discover_slides(slide_dirs), tile=32)
    with h5py.File(out, "r") as f:
        sids = f["slide_ids"][:]
        names = json.loads(f.attrs["slide_names"])
    assert names == ["benign_a", "tumor_a"]
    assert list(sids[:12]) == [0] * 12 and list(sids[12:]) == [1] * 12

    # the eval stream turns provenance into class-prefixed groups the
    # slide-level aggregator keys on
    batches = list(folder_lib.open_dataset_eval(out, 8, num_classes=2))
    flat = [g for b in batches for g in b["group"]]
    assert flat == ["0/benign_a"] * 12 + ["1/tumor_a"] * 12
    assert sum(b["valid"] for b in batches) == 24


def test_min_std_drops_background(tmp_path):
    rng = np.random.default_rng(1)
    slide = tmp_path / "s.npy"
    # top 32 rows constant -> the first grid row (4 tiles) is background
    np.save(str(slide), _plane(rng, H=96, W=128, blank_rows=32))
    out = str(tmp_path / "t.h5")
    counts = folder_lib.build_hdf5_dataset(out, [(str(slide), 0)], tile=32,
                                           min_std=5.0)
    assert counts == [(str(slide), 8)]     # 12 grid tiles - 4 blank


def test_cli_make_dataset_end_to_end(slide_dirs, tmp_path):
    from duoformer_tcga_tpu import cli

    out = str(tmp_path / "cli.h5")
    rc = cli.main(["make-dataset", f"--slides={slide_dirs}",
                   f"--output={out}", "--tile=32"])
    assert rc == 0
    import h5py
    with h5py.File(out, "r") as f:
        assert f["images"].shape[0] == 24


class TestSlideSplit:
    def _pairs(self, n_per_class=5):
        return [(f"/s/c{c}/slide{i}.npy", c)
                for c in (0, 1) for i in range(n_per_class)]

    def test_split_is_stratified_and_disjoint(self):
        train, val = folder_lib.split_slides(self._pairs(), 0.4, seed=1)
        assert len(val) == 4 and len(train) == 6
        for c in (0, 1):     # 2 val slides per class (stratified)
            assert sum(1 for _, cc in val if cc == c) == 2
        assert not set(train) & set(val)
        assert sorted(train + val) == sorted(self._pairs())

    def test_small_class_keeps_one_val_slide(self):
        pairs = [("/a0", 0), ("/a1", 0), ("/b0", 1), ("/b1", 1)]
        train, val = folder_lib.split_slides(pairs, 0.1, seed=0)
        assert sum(1 for _, c in val if c == 0) == 1
        assert sum(1 for _, c in val if c == 1) == 1

    def test_zero_fraction_is_identity(self):
        train, val = folder_lib.split_slides(self._pairs(), 0.0)
        assert val == [] and len(train) == 10

    def test_deterministic_in_seed(self):
        a = folder_lib.split_slides(self._pairs(), 0.4, seed=7)
        b = folder_lib.split_slides(self._pairs(), 0.4, seed=7)
        assert a == b

    def test_bad_fraction_rejected(self):
        with pytest.raises(ValueError, match="val_fraction"):
            folder_lib.split_slides(self._pairs(), 1.0)

    def test_cli_split_writes_both_files(self, tmp_path):
        import h5py

        from duoformer_tcga_tpu import cli

        rng = np.random.default_rng(2)
        for cls in ("a", "b"):
            d = tmp_path / "slides" / cls
            d.mkdir(parents=True)
            for i in range(2):
                np.save(str(d / f"{cls}{i}.npy"), _plane(rng))
        out = str(tmp_path / "t.h5")
        rc = cli.main(["make-dataset", f"--slides={tmp_path}/slides",
                       f"--output={out}", "--tile=32",
                       "--val-fraction=0.5"])
        assert rc == 0
        val = str(tmp_path / "t_val.h5")
        with h5py.File(out, "r") as f, h5py.File(val, "r") as g:
            # 2 slides train + 2 val, 12 tiles each, both classes present
            assert f["images"].shape[0] == 24
            assert g["images"].shape[0] == 24
            assert set(f["labels"][:]) == {0, 1}
            assert set(g["labels"][:]) == {0, 1}
