"""Exact-resume guarantee: training data streams are pure functions of
(seed, epoch) with a start_step, so a resumed run consumes byte-identical
batches to an uninterrupted one — and cmd_train therefore produces
bit-identical parameters whether or not it was interrupted.

The reference has no resume at all (its checkpoints are save-only,
main_toy.py:135-149); stateful shuffle streams (the obvious port) would
replay the dataset head after restore, silently changing the training
trajectory. These tests pin the stronger contract.
"""

import numpy as np

import pytest

import jax

from duoformer_tcga_tpu.data import folder as folder_lib
from duoformer_tcga_tpu.data import pipeline as data_lib


def _batches(it, n):
    import itertools
    return list(itertools.islice(it, n))


def _assert_batches_equal(a, b):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["image"], y["image"])
        np.testing.assert_array_equal(x["label"], y["label"])


def test_synthetic_start_step_matches_tail():
    full = _batches(data_lib.synthetic_tiles(4, 3, seed=5), 10)
    tail = _batches(data_lib.synthetic_tiles(4, 3, seed=5, start_step=7), 3)
    _assert_batches_equal(full[7:], tail)


def test_synthetic_learnable_start_step_matches_tail():
    full = _batches(data_lib.synthetic_tiles(4, 2, seed=1, learnable=True), 6)
    tail = _batches(
        data_lib.synthetic_tiles(4, 2, seed=1, learnable=True, start_step=4),
        2)
    _assert_batches_equal(full[4:], tail)


@pytest.fixture
def npy_folder(tmp_path):
    """2 classes x 3 tiny .npy tiles (no decode dependencies)."""
    rng = np.random.default_rng(0)
    for c in ("a", "b"):
        d = tmp_path / "ds" / c
        d.mkdir(parents=True)
        for i in range(3):
            np.save(d / f"t{i}.npy",
                    rng.integers(0, 256, (16, 16, 3)).astype(np.uint8))
    return str(tmp_path / "ds")


@pytest.mark.parametrize("sampler", ["shuffle", "balanced"])
def test_folder_start_step_matches_tail(npy_folder, sampler):
    """6 samples, batch 2 -> 3 batches/epoch; start_step=4 lands mid
    epoch 1 (epoch crossing exercises the (seed, epoch) keying)."""
    ds = folder_lib.ImageFolderDataset(npy_folder, size=16)
    full = _batches(ds.batches(2, seed=3, sampler=sampler), 8)
    tail = _batches(ds.batches(2, seed=3, sampler=sampler, start_step=4), 4)
    _assert_batches_equal(full[4:], tail)


def test_hdf5_start_step_matches_tail(tmp_path):
    import h5py

    path = str(tmp_path / "tiles.h5")
    rng = np.random.default_rng(2)
    with h5py.File(path, "w") as f:
        f.create_dataset("images",
                         data=rng.integers(0, 256, (7, 8, 8, 3), np.uint8))
        f.create_dataset("labels", data=(np.arange(7) % 2).astype(np.int32))
    # 7 tiles, batch 2 -> 3 batches/epoch; start at 5 = epoch 1, skip 2
    full = _batches(folder_lib.hdf5_tiles(path, 2, seed=9), 9)
    tail = _batches(folder_lib.hdf5_tiles(path, 2, seed=9, start_step=5), 4)
    _assert_batches_equal(full[5:], tail)


def test_open_dataset_passes_start_step(npy_folder):
    full = _batches(folder_lib.open_dataset(npy_folder, 2, num_classes=2,
                                            seed=1, size=16), 5)
    tail = _batches(folder_lib.open_dataset(npy_folder, 2, num_classes=2,
                                            seed=1, size=16, start_step=2), 3)
    _assert_batches_equal(full[2:], tail)


def test_cmd_train_resume_bitwise_identical(tmp_path):
    """End to end through the CLI: 4 straight steps == 2 steps +
    process-restart resume + 2 steps, on the same synthetic stream —
    final params bit-identical (data order, dropout streams, schedule,
    and optimizer state all line up)."""
    from duoformer_tcga_tpu import cli as cli_lib
    from duoformer_tcga_tpu import config as config_lib

    def cfg_for(ckdir):
        return config_lib.from_args([
            "--preset=release-2scale", "--model.depth=1",
            "--model.embed_dim=96", "--model.proj_dim=96",
            "--model.dtype=float32", "--train.platform=cpu",
            "--train.batch_size=8", "--train.steps_per_epoch=2",
            "--train.epochs=2", "--train.checkpoint_every=2",
            "--train.dataset=synthetic",
            f"--train.checkpoint_dir={tmp_path}/{ckdir}",
        ])

    straight = cli_lib.cmd_train(cfg_for("a"))

    cli_lib.cmd_train(cfg_for("b"), max_steps=2)   # interrupted at step 2
    resumed = cli_lib.cmd_train(cfg_for("b"))      # restores, runs 3..4

    sp = jax.device_get(straight["params"])
    rp = jax.device_get(resumed["params"])
    for a, b in zip(jax.tree.leaves(sp), jax.tree.leaves(rp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(jax.device_get(resumed["step"])) == 4
