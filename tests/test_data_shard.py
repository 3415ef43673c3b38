"""Multi-host input sharding: with shard=(k, n) each process loads only
its row block of every GLOBAL batch, and the blocks concatenate bitwise
to the single-process stream — the invariant that makes
jax.make_array_from_process_local_data assembly produce the exact
single-controller batch on a pod. (The reference has no distributed
input path at all; SURVEY §5.8.)"""

import numpy as np

import pytest

from duoformer_tcga_tpu.data import folder as folder_lib
from duoformer_tcga_tpu.data import pipeline as data_lib


def _take(it, n):
    import itertools
    return list(itertools.islice(it, n))


def _assert_shards_assemble(mk_stream, n_batches=6, n_shards=2):
    full = _take(mk_stream(None), n_batches)
    shards = [_take(mk_stream((k, n_shards)), n_batches)
              for k in range(n_shards)]
    for i, ref in enumerate(full):
        img = np.concatenate([shards[k][i]["image"]
                              for k in range(n_shards)])
        lbl = np.concatenate([shards[k][i]["label"]
                              for k in range(n_shards)])
        np.testing.assert_array_equal(img, ref["image"])
        np.testing.assert_array_equal(lbl, ref["label"])


def test_synthetic_shards_assemble():
    _assert_shards_assemble(
        lambda s: data_lib.synthetic_tiles(4, 3, seed=2, size=16, shard=s))


@pytest.fixture
def npy_folder(tmp_path):
    rng = np.random.default_rng(0)
    for c in ("a", "b"):
        d = tmp_path / "ds" / c
        d.mkdir(parents=True)
        for i in range(5):
            np.save(d / f"t{i}.npy",
                    rng.integers(0, 256, (16, 16, 3)).astype(np.uint8))
    return str(tmp_path / "ds")


@pytest.mark.parametrize("sampler", ["shuffle", "balanced"])
def test_folder_shards_assemble(npy_folder, sampler):
    ds = folder_lib.ImageFolderDataset(npy_folder, size=16)
    _assert_shards_assemble(
        lambda s: ds.batches(4, seed=1, sampler=sampler, shard=s))


def test_hdf5_shards_assemble(tmp_path):
    import h5py

    path = str(tmp_path / "t.h5")
    rng = np.random.default_rng(3)
    with h5py.File(path, "w") as f:
        f.create_dataset("images",
                         data=rng.integers(0, 256, (10, 8, 8, 3), np.uint8))
        f.create_dataset("labels", data=(np.arange(10) % 3).astype(np.int32))
    _assert_shards_assemble(
        lambda s: folder_lib.hdf5_tiles(path, 4, seed=5, num_classes=3,
                                        shard=s))


def test_hdf5_balanced_shards_assemble(tmp_path):
    """Balanced sampling draws duplicates — the unique/inverse h5py read
    must still restore the logical row order per shard."""
    import h5py

    path = str(tmp_path / "t.h5")
    rng = np.random.default_rng(4)
    with h5py.File(path, "w") as f:
        f.create_dataset("images",
                         data=rng.integers(0, 256, (6, 8, 8, 3), np.uint8))
        f.create_dataset("labels",
                         data=np.array([0, 0, 0, 0, 0, 1], np.int32))
    _assert_shards_assemble(
        lambda s: folder_lib.hdf5_tiles(path, 4, seed=6, num_classes=2,
                                        sampler="balanced", shard=s))


def test_shard_composes_with_start_step(npy_folder):
    ds = folder_lib.ImageFolderDataset(npy_folder, size=16)
    full = _take(ds.batches(4, seed=7, shard=(1, 2)), 7)
    tail = _take(ds.batches(4, seed=7, shard=(1, 2), start_step=4), 3)
    for a, b in zip(full[4:], tail):
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["label"], b["label"])


def test_open_dataset_passes_shard(npy_folder):
    _assert_shards_assemble(
        lambda s: folder_lib.open_dataset(npy_folder, 4, num_classes=2,
                                          seed=1, size=16, shard=s),
        n_batches=4)


def test_invalid_shard_rejected():
    with pytest.raises(ValueError, match="divisible"):
        next(data_lib.synthetic_tiles(5, 2, shard=(0, 2)))
    with pytest.raises(ValueError, match="index"):
        next(data_lib.synthetic_tiles(4, 2, shard=(2, 2)))


def test_multihost_init_hook(monkeypatch):
    """--train.multihost calls jax.distributed.initialize exactly once."""
    import jax

    from duoformer_tcga_tpu import cli as cli_lib
    from duoformer_tcga_tpu import config as config_lib

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append(1))
    monkeypatch.setattr(cli_lib, "_distributed_initialized", False)
    cfg = config_lib.Config()
    cli_lib._maybe_init_multihost(cfg)
    assert calls == []                       # off by default
    cfg.train.multihost = True
    cli_lib._maybe_init_multihost(cfg)
    cli_lib._maybe_init_multihost(cfg)       # idempotent
    assert calls == [1]
