"""Temperature calibration + D4 test-time augmentation: the serving
calibration/robustness layer the reference (per-tile argmax only) has no
equivalent of."""

import numpy as np

import pytest

import jax
import jax.numpy as jnp

from duoformer_tcga_tpu.utils.metrics import (expected_calibration_error,
                                              fit_temperature, nll_of)


def _softmax(z):
    z = z - z.max(-1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(-1, keepdims=True)


def test_fit_temperature_recovers_known_overconfidence():
    """Labels drawn from softmax(z); scores published as softmax(2z)
    (overconfident by exactly T=2) — the fit must recover ~2 and the
    calibrated NLL must match the well-calibrated one."""
    rng = np.random.default_rng(0)
    z = rng.normal(size=(6000, 3)) * 1.5
    p_true = _softmax(z)
    labels = np.array([rng.choice(3, p=p) for p in p_true])
    over = _softmax(2.0 * z)
    T = fit_temperature(np.log(over), labels)
    assert 1.8 < T < 2.2, T
    cal = _softmax(np.log(over) / T)
    assert nll_of(cal, labels) < nll_of(over, labels) - 0.01
    np.testing.assert_allclose(nll_of(cal, labels), nll_of(p_true, labels),
                               atol=0.02)
    assert expected_calibration_error(cal, labels) < \
        expected_calibration_error(over, labels)


def test_fit_temperature_calibrated_input_gives_T_near_1():
    rng = np.random.default_rng(1)
    z = rng.normal(size=(6000, 4)) * 2.0
    p = _softmax(z)
    labels = np.array([rng.choice(4, p=pi) for pi in p])
    T = fit_temperature(np.log(p), labels)
    assert 0.9 < T < 1.1, T


def test_d4_transform_matches_numpy():
    from duoformer_tcga_tpu.data import pipeline as data_lib

    x = np.arange(2 * 4 * 4 * 3, dtype=np.float32).reshape(2, 4, 4, 3)
    for code in range(8):
        ref = x
        if code & 1:
            ref = ref.transpose(0, 2, 1, 3)
        if code & 2:
            ref = ref[:, ::-1]
        if code & 4:
            ref = ref[:, :, ::-1]
        out = np.asarray(data_lib.d4_transform(jnp.asarray(x), code))
        np.testing.assert_array_equal(out, ref)


@pytest.fixture(scope="module")
def tiny_predictor():
    import duoformer_tcga_tpu as dft
    from duoformer_tcga_tpu.inference import Predictor

    m = dft.build_model_no_extra_params(
        num_classes=3, num_layers=2, depth=1, embed_dim=96, proj_dim=96,
        num_heads=12, dtype=jnp.float32)
    p = m.init(jax.random.PRNGKey(0))
    return Predictor(m, p, dtype=jnp.float32)


def test_tta_invariant_input_equals_plain(tiny_predictor):
    """A D4-invariant tile (constant image) must give identical probs
    with and without TTA — pins that TTA is averaging exactly the 8
    symmetries of the same content, nothing else."""
    tiles = np.full((2, 224, 224, 3), 127, np.uint8)
    plain = np.asarray(tiny_predictor.predict_proba(tiles))
    tta = np.asarray(tiny_predictor.predict_proba(tiles, tta=True))
    np.testing.assert_allclose(tta, plain, atol=1e-5)
    np.testing.assert_allclose(tta.sum(-1), np.ones(2), atol=1e-5)


def test_tta_random_input_valid_distribution(tiny_predictor):
    tiles = np.random.default_rng(3).integers(0, 256, (2, 224, 224, 3),
                                              np.uint8)
    tta = np.asarray(tiny_predictor.predict_proba(tiles, tta=True))
    assert tta.shape == (2, 3)
    np.testing.assert_allclose(tta.sum(-1), np.ones(2), atol=1e-5)
    assert (tta >= 0).all()


def test_predict_proba_temperature(tiny_predictor):
    """predict_proba(temperature=T) == host-side retempering of the raw
    probabilities (log-prob identity)."""
    tiles = np.random.default_rng(4).integers(0, 256, (2, 224, 224, 3),
                                              np.uint8)
    raw = np.asarray(tiny_predictor.predict_proba(tiles))
    t2 = np.asarray(tiny_predictor.predict_proba(tiles, temperature=2.0))
    want = _softmax(np.log(raw) / 2.0)
    np.testing.assert_allclose(t2, want, atol=1e-5)
    # T > 1 softens: max prob strictly decreases (non-degenerate rows)
    assert (t2.max(-1) < raw.max(-1) + 1e-7).all()


def test_cli_eval_calibrate_and_calibrated_export(tmp_path):
    """eval --calibrate reports T/NLL/ECE; export --temperature stamps
    the artifact; predict --params serves at the stored temperature."""
    import csv
    import json

    from PIL import Image

    from duoformer_tcga_tpu import cli

    common = ["--preset=release-2scale", "--model.depth=1",
              "--model.embed_dim=96", "--model.proj_dim=96",
              "--model.dtype=float32", "--train.platform=cpu",
              "--train.batch_size=8",
              f"--train.checkpoint_dir={tmp_path}/ck"]
    assert cli.main(["train", *common, "--steps=1"]) == 0
    rep = str(tmp_path / "eval.json")
    assert cli.main(["eval", *common, "--calibrate",
                     f"--report={rep}"]) == 0
    cal = json.load(open(rep))["calibration"]
    assert cal and cal["temperature"] > 0
    assert cal["nll_calibrated"] <= cal["nll"] + 1e-9

    art = str(tmp_path / "m.npz")
    assert cli.main(["export", *common, f"--output={art}",
                     "--temperature=2.0"]) == 0

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 256, (224, 224, 3),
                                     np.uint8)).save(str(imgs / f"t{i}.png"))

    def probs_of(out):
        with open(out) as f:
            return np.array([[float(x) for x in row[2:]]
                             for row in list(csv.reader(f))[1:]])

    o1, o2 = str(tmp_path / "p1.csv"), str(tmp_path / "p2.csv")
    assert cli.main(["predict", *common, f"--input={imgs}",
                     f"--output={o1}"]) == 0
    assert cli.main(["predict", *common, f"--input={imgs}",
                     f"--output={o2}", f"--params={art}"]) == 0
    p1, p2 = probs_of(o1), probs_of(o2)
    np.testing.assert_allclose(p2, _softmax(np.log(p1) / 2.0), atol=1e-4)
