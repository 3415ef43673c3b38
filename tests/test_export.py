"""Serving-artifact export (`cli export` / inference.export_serving_artifact).

The deployment hand-off the reference lacks: it re-pickles whole torch
modules (quirk Q14, /root/reference/main_toy.py:139-149). Here a trained
checkpoint exports to one npz (BN-folded, optionally int8) that predict
serves without orbax state or re-folding.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import duoformer_tcga_tpu as dft
from duoformer_tcga_tpu import inference as inf


@pytest.fixture(scope="module")
def small_model_params():
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    model = dft.build_model_no_extra_params(
        num_classes=2, num_layers=2, embed_dim=128, proj_dim=128,
        num_heads=8, depth=1)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_roundtrip_matches_in_memory_predictor(small_model_params,
                                               tmp_path):
    model, params = small_model_params
    path = str(tmp_path / "m.npz")
    meta = inf.export_serving_artifact(path, params,
                                       {"model": {"num_classes": 2}})
    assert meta["folded"] and not meta["quantized"]

    loaded, lmeta = inf.load_serving_artifact(path)
    assert lmeta["model"]["num_classes"] == 2
    assert lmeta["format_version"] == 1

    x = np.random.default_rng(1).integers(0, 256, (2, 224, 224, 3),
                                          dtype=np.uint8)
    ref = np.asarray(inf.Predictor(model, params,
                                   dtype=jnp.float32)(x))
    out = np.asarray(inf.Predictor(model, loaded, dtype=jnp.float32,
                                   fold=False, quantize=False)(x))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)

    out2 = np.asarray(inf.from_serving_artifact(
        model, path, dtype=jnp.float32)(x))
    np.testing.assert_allclose(out2, ref, atol=1e-5, rtol=1e-5)


def test_quantized_export_matches_quantize_on_load(small_model_params,
                                                   tmp_path):
    model, params = small_model_params
    path = str(tmp_path / "m_int8.npz")
    meta = inf.export_serving_artifact(path, params, {}, quantize=True)
    assert meta["quantized"]

    loaded, _ = inf.load_serving_artifact(path)
    # int8 leaves survived the round-trip with dtype intact
    sb = loaded["transformer"]["scale_blocks"]["mlp"]["fc1"]
    assert sb["w_q"].dtype == jnp.int8

    x = np.random.default_rng(2).integers(0, 256, (2, 224, 224, 3),
                                          dtype=np.uint8)
    ref = np.asarray(inf.Predictor(model, params, dtype=jnp.float32,
                                   quantize=True)(x))
    out = np.asarray(inf.from_serving_artifact(
        model, path, dtype=jnp.float32)(x))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_cli_export_then_predict(tmp_path):
    """End-to-end: train 2 steps -> export -> predict --params; the CSV
    must match predicting from the checkpoint directly."""
    from PIL import Image

    from duoformer_tcga_tpu import cli

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 256, (224, 224, 3),
                                     dtype=np.uint8)).save(
            str(imgs / f"t{i}.png"))
    common = ["--preset=release-2scale", "--model.depth=1",
              "--model.embed_dim=96", "--model.proj_dim=96",
              "--model.dtype=float32", "--train.platform=cpu",
              "--train.batch_size=8",  # divides the 8-dev test mesh
              f"--train.checkpoint_dir={tmp_path}/ck"]
    assert cli.main(["train", *common, "--steps=2"]) == 0

    art = tmp_path / "model.npz"
    assert cli.main(["export", *common, f"--output={art}"]) == 0
    assert art.exists()

    out_ck = tmp_path / "preds_ck.csv"
    out_art = tmp_path / "preds_art.csv"
    assert cli.main(["predict", *common, f"--input={imgs}",
                     f"--output={out_ck}"]) == 0
    assert cli.main(["predict", *common, f"--input={imgs}",
                     f"--output={out_art}", f"--params={art}"]) == 0

    def probs(p):
        lines = p.read_text().strip().split("\n")[1:]
        return np.array([[float(x) for x in l.split(",")[2:]]
                         for l in lines])
    np.testing.assert_allclose(probs(out_art), probs(out_ck), atol=1e-5)


def test_export_without_checkpoint_is_loud(tmp_path):
    from duoformer_tcga_tpu import cli, config as config_lib

    cfg = config_lib.from_args([
        "--preset=release-2scale", "--model.depth=1",
        "--model.embed_dim=96", "--model.proj_dim=96",
        "--model.dtype=float32", "--train.platform=cpu",
        f"--train.checkpoint_dir={tmp_path}/nope"])
    with pytest.raises(FileNotFoundError, match="no checkpoint"):
        cli.cmd_export(cfg, str(tmp_path / "m.npz"))


def test_predict_rejects_mismatched_artifact(small_model_params, tmp_path):
    from duoformer_tcga_tpu import cli, config as config_lib

    _model, params = small_model_params
    path = str(tmp_path / "m.npz")
    inf.export_serving_artifact(path, params,
                                {"model": {"num_classes": 2,
                                           "embed_dim": 128}})
    cfg = config_lib.from_args([
        "--preset=release-2scale", "--model.depth=1",
        "--model.embed_dim=96", "--model.proj_dim=96",
        "--model.dtype=float32", "--train.platform=cpu",
        f"--train.checkpoint_dir={tmp_path}/ck"])
    with pytest.raises(ValueError, match="embed_dim"):
        cli.cmd_predict(cfg, str(tmp_path), params_path=path)


def test_predict_rejects_behavior_flag_mismatch(small_model_params,
                                                tmp_path):
    """apply_fc_norm changes logits without changing any param shape —
    an artifact trained with it must not silently serve under a config
    without it (ADVICE r4 medium)."""
    from duoformer_tcga_tpu import cli, config as config_lib

    _model, params = small_model_params
    path = str(tmp_path / "m.npz")
    inf.export_serving_artifact(path, params,
                                {"model": {"num_classes": 2,
                                           "embed_dim": 96,
                                           "apply_fc_norm": True}})
    cfg = config_lib.from_args([
        "--preset=release-2scale", "--model.depth=1",
        "--model.embed_dim=96", "--model.proj_dim=96",
        "--model.dtype=float32", "--train.platform=cpu",
        f"--train.checkpoint_dir={tmp_path}/ck"])
    with pytest.raises(ValueError, match="apply_fc_norm"):
        cli.cmd_predict(cfg, str(tmp_path), params_path=path)


def test_cli_export_torch_backbone(tmp_path, capsys):
    """cli export --torch-backbone= writes the trained trunk as a
    torchvision state_dict that round-trips bit-exactly through the
    import converter — and warm-starts a fresh model via the
    --train.init_backbone= path."""
    import torch

    from duoformer_tcga_tpu import cli
    from duoformer_tcga_tpu import train as train_lib
    from duoformer_tcga_tpu.utils import torch_convert as tc

    ck = str(tmp_path / "ck")
    tiny = ["--preset=release-2scale", "--model.depth=1",
            "--model.embed_dim=96", "--model.proj_dim=96",
            "--model.dtype=float32", "--train.platform=cpu",
            "--train.batch_size=8", "--steps=1",
            f"--train.checkpoint_dir={ck}"]
    assert cli.main(["train"] + tiny) in (0, None)
    out_sd = str(tmp_path / "trunk.torch")
    assert cli.main(["export"] + tiny +
                    [f"--output={tmp_path}/m.npz",
                     f"--torch-backbone={out_sd}"]) in (0, None)
    assert "exported backbone trunk" in capsys.readouterr().out

    sd = torch.load(out_sd, map_location="cpu", weights_only=True)
    assert "layer4.2.bn3.running_var" in sd
    rt = tc.convert_resnet(sd, 50)

    model = dft.build_model_no_extra_params(
        num_classes=2, num_layers=2, embed_dim=96, proj_dim=96,
        num_heads=12, depth=1)
    fresh = model.init(jax.random.PRNGKey(5))
    warm = train_lib.warm_start_params(model, fresh, init_backbone=out_sd)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(warm["backbone"]),
            jax.tree_util.tree_leaves_with_path(rt)):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=jax.tree_util.keystr(pa))
