"""Data pipeline + config system + checkpoint roundtrip tests."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from duoformer_tcga_tpu import config as config_lib
from duoformer_tcga_tpu.data import pipeline as data_lib


class TestPipeline:
    def test_normalize_matches_torchvision_semantics(self):
        x = np.random.default_rng(0).integers(0, 256, (2, 8, 8, 3),
                                              dtype=np.uint8)
        out = data_lib.normalize(jnp.asarray(x), dtype=jnp.float32)
        # torchvision: ToTensor (/255) then Normalize((x-mean)/std)
        ref = (x.astype(np.float32) / 255.0
               - np.array(data_lib.IMAGENET_MEAN)) / np.array(data_lib.IMAGENET_STD)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_patchify_roundtrip(self):
        region = jnp.arange(4 * 6 * 3).reshape(4, 6, 3)
        tiles = data_lib.patchify(region, tile=2)
        assert tiles.shape == (6, 2, 2, 3)
        # tile 0 is the top-left 2x2
        np.testing.assert_array_equal(np.asarray(tiles[0]),
                                      np.asarray(region[:2, :2]))
        # tile order is row-major over the grid
        np.testing.assert_array_equal(np.asarray(tiles[3]),
                                      np.asarray(region[2:4, :2]))

    def test_resize_matches_torch_bilinear(self):
        torch.manual_seed(0)
        x = torch.rand(1, 3, 16, 16)
        ref = torch.nn.functional.interpolate(
            x, size=(8, 8), mode="bilinear", align_corners=False,
            antialias=False)
        out = data_lib.resize(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), 8)
        np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                                   ref.numpy(), atol=1e-5)

    def test_prefetch_loader(self):
        it = data_lib.synthetic_tiles(4, num_classes=3, num_batches=5)
        loader = data_lib.PrefetchLoader(it)
        batches = list(loader)
        assert len(batches) == 5
        assert batches[0]["image"].shape == (4, 224, 224, 3)
        assert batches[0]["label"].shape == (4,)

    def test_prefetch_loader_reraises_iterator_errors(self):
        """A data-pipeline exception must surface on the consumer thread,
        not degrade into a short (0-step) 'successful' epoch — the loaders
        validate lazily inside their generators (label range etc.)."""
        def bad_iter():
            yield {"image": np.zeros((2, 8, 8, 3), np.uint8),
                   "label": np.zeros((2,), np.int32)}
            raise ValueError("label 7 out of range")

        loader = data_lib.PrefetchLoader(bad_iter())
        next(loader)                       # first batch flows
        with pytest.raises(ValueError, match="label 7 out of range"):
            next(loader)

    def test_preprocess_resizes_rectangular_tiles(self):
        """The resize gate must look at BOTH spatial dims: [B, H!=size,
        W==size] previously skipped the resize entirely."""
        x = jnp.zeros((2, 300, 224, 3), jnp.uint8)
        out = data_lib.preprocess_tiles(x, size=224, dtype=jnp.float32)
        assert out.shape == (2, 224, 224, 3)


class TestConfig:
    def test_defaults_build(self):
        cfg = config_lib.Config()
        model = cfg.model.build()
        assert model.transformer.depth == 12

    def test_presets_cover_variant_matrix(self):
        for name in ["release-2scale", "release-4scale", "legacy-channel",
                     "hybrid-baseline", "resnet50-linear-probe"]:
            assert name in config_lib.PRESETS

    def test_overrides(self):
        cfg = config_lib.from_args(
            ["--preset=release-4scale", "--model.depth=6",
             "--train.lr=0.003", "--model.init_values=1e-5",
             "--model.freeze_backbone=false"])
        assert cfg.model.num_layers == 4
        assert cfg.model.depth == 6
        assert cfg.train.lr == 0.003
        assert cfg.model.init_values == 1e-5
        assert cfg.model.freeze_backbone is False

    def test_bad_override_raises(self):
        with pytest.raises(KeyError):
            config_lib.from_args(["--model.nonexistent=1"])

    def test_bool_flag_spellings(self):
        # bare flag means True (argparse store_true intuition) ...
        cfg = config_lib.from_args(["--model.remat"])
        assert cfg.model.remat is True
        # ... explicit false still works ...
        cfg = config_lib.from_args(["--model.remat=false"])
        assert cfg.model.remat is False
        # ... and '' / typos are loud instead of silently False
        with pytest.raises(ValueError):
            config_lib.from_args(["--model.remat="])
        with pytest.raises(ValueError):
            config_lib.from_args(["--model.remat=flase"])
        # bare flag on a non-bool field is an error, not int(None)
        with pytest.raises(ValueError):
            config_lib.from_args(["--model.depth"])


class TestCheckpoint:
    def test_npz_roundtrip(self, tmp_path):
        from duoformer_tcga_tpu.utils import checkpoint as ckpt_lib

        params = {"a": jnp.ones((2, 3)),
                  "nested": {"b": jnp.arange(4.0)},
                  "stack": [{"w": jnp.zeros((2,))}, {"w": jnp.ones((2,))}]}
        path = str(tmp_path / "p.npz")
        ckpt_lib.save_params_npz(path, params)
        restored = ckpt_lib.load_params_npz(path, params)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_orbax_roundtrip(self, tmp_path):
        from duoformer_tcga_tpu.utils.checkpoint import CheckpointManager

        state = {"params": {"w": jnp.ones((3,))},
                 "step": jnp.asarray(7, jnp.int32)}
        mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
        mgr.save(7, jax.device_get(state))
        mgr.wait()
        assert mgr.latest_step() == 7
        restored = mgr.restore(jax.device_get(state))
        np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                      np.ones((3,)))
        mgr.close()

    def test_best_checkpoint_survives_recency_pruning(self, tmp_path):
        """orbax max_to_keep prunes by RECENCY; the best-accuracy save
        must live in the companion best/ manager so later periodic saves
        cannot delete it."""
        from duoformer_tcga_tpu.utils.checkpoint import CheckpointManager

        def state(v):
            return {"params": {"w": np.full((3,), float(v), np.float32)},
                    "step": np.asarray(v, np.int32)}

        mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
        mgr.save_best(2, state(2), metrics={"eval_accuracy": 0.9})
        for s in (3, 4, 5):                  # rolling saves prune to {4,5}
            mgr.save(s, state(s))
        mgr.wait()
        assert mgr.latest_step() == 5
        assert mgr.best_step() == 2
        best = mgr.restore_best(state(0))
        assert int(best["step"]) == 2
        np.testing.assert_array_equal(np.asarray(best["params"]["w"]),
                                      np.full((3,), 2.0))
        mgr.close()

        # a fresh manager (eval/predict process) still finds the best
        mgr2 = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
        assert mgr2.best_step() == 2
        assert int(mgr2.restore_best(state(0))["step"]) == 2
        mgr2.close()

        # and a directory without a best/ save reports None cleanly
        mgr3 = CheckpointManager(str(tmp_path / "ckpt2"))
        assert mgr3.best_step() is None
        assert mgr3.restore_best(state(0)) is None
        assert mgr3.best_metrics() is None
        mgr3.close()

    def test_best_metrics_survive_resume(self, tmp_path):
        """A resumed run reads the historical best metric (the bar to
        beat) instead of overwriting a better best with epoch-1 noise."""
        from duoformer_tcga_tpu.utils.checkpoint import CheckpointManager

        state = {"step": np.asarray(4, np.int32)}
        mgr = CheckpointManager(str(tmp_path / "ck"))
        mgr.save_best(4, state, metrics={"eval_accuracy": 0.87})
        mgr.wait()
        mgr.close()
        mgr2 = CheckpointManager(str(tmp_path / "ck"))
        bm = mgr2.best_metrics()
        assert bm["eval_accuracy"] == 0.87 and bm["step"] == 4
        mgr2.close()


def test_cli_predict_writes_csv(tmp_path):
    """End-to-end `cli predict`: folder of PNGs -> per-tile probability
    CSV (padding exercised: 3 images, batch 2)."""
    import numpy as np
    from PIL import Image

    from duoformer_tcga_tpu import cli

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 256, (224, 224, 3),
                                     dtype=np.uint8)).save(
            str(imgs / f"t{i}.png"))
    out = tmp_path / "preds.csv"
    rc = cli.main([
        "predict", "--preset=release-2scale", "--model.depth=1",
        "--model.embed_dim=96", "--model.proj_dim=96",
        "--model.dtype=float32", "--train.platform=cpu",
        "--train.batch_size=2",
        f"--train.checkpoint_dir={tmp_path}/ck",
        f"--input={imgs}", f"--output={out}",
    ])
    assert rc == 0
    lines = out.read_text().strip().split("\n")
    assert lines[0].startswith("path,pred,prob_0")
    assert len(lines) == 4            # header + 3 rows
    probs = np.array([[float(x) for x in l.split(",")[2:]]
                      for l in lines[1:]])
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)


def test_eval_dataset_config_parses():
    from duoformer_tcga_tpu import config as config_lib

    cfg = config_lib.from_args(["--preset=release-2scale",
                                "--train.dataset=/data/train",
                                "--train.eval_dataset=/data/val"])
    assert cfg.train.dataset == "/data/train"
    assert cfg.train.eval_dataset == "/data/val"
    cfg2 = config_lib.from_args(["--preset=release-2scale"])
    assert cfg2.train.eval_dataset is None


def test_cli_plot_from_metrics(tmp_path, capsys):
    """cli plot renders the accuracy curves from a metrics JSONL (the
    reference's main_toy.py:151-191 plot as a standalone command)."""
    import json

    from duoformer_tcga_tpu import cli

    path = str(tmp_path / "metrics.jsonl")
    with open(path, "w") as f:
        for step in (1, 2, 3, 4):
            rec = {"step": step, "accuracy": 0.2 * step}
            if step % 2 == 0:
                rec["eval_accuracy"] = 0.25 * step
            f.write(json.dumps(rec) + "\n")
    out_png = str(tmp_path / "acc.png")
    cli.main(["plot", f"--metrics={path}", f"--output={out_png}"])
    out = capsys.readouterr().out
    import os as _os
    assert _os.path.isfile(out_png) or "eval" in out  # png or ASCII fallback


def test_cli_plot_missing_metrics_is_loud(tmp_path):
    import pytest

    from duoformer_tcga_tpu import cli

    with pytest.raises(FileNotFoundError, match="metrics"):
        cli.main(["plot", f"--train.checkpoint_dir={tmp_path}/nope"])


def test_enable_compile_cache(tmp_path, monkeypatch):
    """DUOFORMER_COMPILE_CACHE: jitted executables persist to the cache
    dir (reused across processes on the slow remote-compile transport)."""
    import os

    import jax
    import jax.numpy as jnp

    from duoformer_tcga_tpu.utils import profiling

    assert profiling.enable_compile_cache(None) is None or True  # env unset ok
    cache = str(tmp_path / "cc")
    monkeypatch.setenv("DUOFORMER_COMPILE_CACHE", cache)
    try:
        assert profiling.enable_compile_cache() == cache
        jax.jit(lambda x: x * 3 + 1)(jnp.ones((4,)))
        assert os.listdir(cache)
    finally:
        # global jax config: do not leave later tests writing into a
        # pytest tmp dir
        jax.config.update("jax_compilation_cache_dir", None)
