"""Hermetic StableHLO serving export (utils/stablehlo.py).

The artifact packages serialized StableHLO (uint8 preprocessing fused,
pure-XLA lowering for cpu+tpu) plus the BN-folded params in one zip;
loading needs only jax — no model code, no torch. The reference's only
"export" is the Q14 whole-object pickle that cannot even load without
the original class definitions (/root/reference/main_toy.py:139-149).
"""

import json
import zipfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import duoformer_tcga_tpu as dft
from duoformer_tcga_tpu import inference as inf
from duoformer_tcga_tpu.utils import stablehlo as sh


@pytest.fixture(scope="module")
def small_model_params():
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    model = dft.build_model_no_extra_params(
        num_classes=3, num_layers=2, embed_dim=128, proj_dim=128,
        num_heads=8, depth=1)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_roundtrip_matches_predictor(small_model_params, tmp_path):
    model, params = small_model_params
    path = str(tmp_path / "m.dfz")
    meta = sh.export_stablehlo(model, params, path, batch_size=2,
                               dtype=jnp.float32)
    assert meta["batch"] == 2 and meta["folded"]
    assert "cpu" in meta["platforms"]

    pred = sh.load_stablehlo(path)
    assert pred.batch == 2
    x = np.random.default_rng(1).integers(0, 256, (2, 224, 224, 3),
                                          dtype=np.uint8)
    ref = np.asarray(inf.Predictor(model, params, dtype=jnp.float32)(x))
    out = np.asarray(pred(x))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)
    probs = np.asarray(pred.predict_proba(x))
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)


def test_artifact_is_model_code_free(small_model_params, tmp_path):
    """The zip holds exactly (meta, module, params); the module is
    versioned-serialized StableHLO, not pickled Python."""
    model, params = small_model_params
    path = str(tmp_path / "m.dfz")
    sh.export_stablehlo(model, params, path, batch_size=1,
                        dtype=jnp.float32)
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        assert names == {sh.META_NAME, sh.MODULE_NAME, sh.PARAMS_NAME}
        meta = json.loads(z.read(sh.META_NAME).decode())
        assert meta["format"] == "duoformer-stablehlo"
        assert meta["num_classes"] == 3
        module = z.read(sh.MODULE_NAME)
    # deserializes through jax.export alone
    from jax import export as jexport
    exported = jexport.deserialize(module)
    assert exported.in_avals[-1].dtype == np.uint8


def test_short_batch_padding_pattern(small_model_params, tmp_path):
    """Serving a batch shorter than the static export batch: pad + slice
    (the cli predict pattern) yields the same logits as the unpadded rows."""
    model, params = small_model_params
    path = str(tmp_path / "m.dfz")
    sh.export_stablehlo(model, params, path, batch_size=4,
                        dtype=jnp.float32)
    pred = sh.load_stablehlo(path)
    x = np.random.default_rng(2).integers(0, 256, (3, 224, 224, 3),
                                          dtype=np.uint8)
    padded = np.concatenate([x, np.zeros((1, 224, 224, 3), np.uint8)])
    out = np.asarray(pred(padded))[:3]
    ref = np.asarray(inf.Predictor(model, params, dtype=jnp.float32)(
        np.concatenate([x, np.zeros((1, 224, 224, 3), np.uint8)])))[:3]
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_cli_export_stablehlo_then_predict(tmp_path):
    """End-to-end: train 2 steps -> export --stablehlo -> predict
    --stablehlo; CSV must match predicting from the checkpoint."""
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
              "--train.batch_size=8",
              f"--train.checkpoint_dir={tmp_path}/ck"]
    assert cli.main(["train", *common, "--steps=2"]) == 0

    art = tmp_path / "model.dfz"
    assert cli.main(["export", *common,
                     f"--output={tmp_path}/model.npz",
                     f"--stablehlo={art}"]) == 0
    assert art.exists()

    out_ck = tmp_path / "preds_ck.csv"
    out_sh = tmp_path / "preds_sh.csv"
    assert cli.main(["predict", *common, f"--input={imgs}",
                     f"--output={out_ck}"]) == 0
    assert cli.main(["predict", *common, f"--input={imgs}",
                     f"--output={out_sh}", f"--stablehlo={art}"]) == 0

    def probs(p):
        lines = p.read_text().strip().split("\n")[1:]
        return np.array([[float(x) for x in l.split(",")[2:]]
                         for l in lines])
    np.testing.assert_allclose(probs(out_sh), probs(out_ck), atol=1e-5)


def test_stablehlo_rejects_quantize(small_model_params, tmp_path):
    from duoformer_tcga_tpu import cli, config as config_lib

    cfg = config_lib.from_args([
        "--preset=release-2scale", "--model.dtype=float32",
        "--train.platform=cpu", f"--train.checkpoint_dir={tmp_path}/ck"])
    with pytest.raises(ValueError, match="stablehlo"):
        cli.cmd_export(cfg, str(tmp_path / "m.npz"), quantize=True,
                       stablehlo=str(tmp_path / "m.dfz"))


def test_predict_stablehlo_rejects_embeddings(tmp_path):
    from duoformer_tcga_tpu import cli, config as config_lib

    cfg = config_lib.from_args(["--train.platform=cpu"])
    with pytest.raises(ValueError, match="embeddings"):
        cli.cmd_predict(cfg, str(tmp_path), stablehlo_path="x.dfz",
                        embeddings_path="e.npz")
