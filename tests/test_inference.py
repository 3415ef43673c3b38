"""Serving front-end: Predictor from a saved torch checkpoint, end-to-end
(file -> permissive unpickle -> convert -> fold -> jitted uint8 pipeline ->
logit parity with the torch oracle)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from duoformer_tcga_tpu.inference import Predictor, from_torch_checkpoint
from duoformer_tcga_tpu.models.duoformer import DuoFormer

from torch_oracle import OracleDuoFormer


def _small_pair(seed=0):
    torch.manual_seed(seed)
    oracle = OracleDuoFormer(depth=2, embed_dim=96, num_heads=12,
                             num_classes=3, num_layers=2, proj_dim=96)
    oracle.eval()
    model = DuoFormer(depth=2, embed_dim=96, num_heads=12, num_classes=3,
                      num_layers=2, proj_dim=96, dtype=jnp.float32)
    return oracle, model


def test_predictor_from_state_dict_checkpoint(tmp_path):
    oracle, model = _small_pair()
    path = str(tmp_path / "ckpt.pt")
    torch.save(oracle.state_dict(), path)

    pred = from_torch_checkpoint(model, path, dtype=jnp.float32)
    tiles = np.random.default_rng(0).integers(
        0, 256, (2, 224, 224, 3), dtype=np.uint8)

    # oracle gets the exact same normalized input
    from duoformer_tcga_tpu.data import pipeline as pipe
    xn = np.asarray(pipe.normalize(jnp.asarray(tiles), dtype=jnp.float32))
    with torch.no_grad():
        ref = oracle(torch.from_numpy(xn.transpose(0, 3, 1, 2))).numpy()

    out = np.asarray(pred(tiles))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)
    proba = np.asarray(pred.predict_proba(tiles))
    np.testing.assert_allclose(proba.sum(-1), 1.0, atol=1e-5)


def test_predictor_from_whole_object_checkpoint(tmp_path):
    """Q14 format: the reference pickles whole module objects
    (main_toy.py:139-149)."""
    oracle, model = _small_pair(seed=1)
    path = str(tmp_path / "whole.pt")
    torch.save({"epoch": 3, "model": oracle, "train_acc": [0.5]}, path)

    pred = from_torch_checkpoint(model, path, dtype=jnp.float32)
    tiles = np.random.default_rng(1).integers(
        0, 256, (2, 224, 224, 3), dtype=np.uint8)
    from duoformer_tcga_tpu.data import pipeline as pipe
    xn = np.asarray(pipe.normalize(jnp.asarray(tiles), dtype=jnp.float32))
    with torch.no_grad():
        ref = oracle(torch.from_numpy(xn.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(pred(tiles)), ref,
                               atol=2e-4, rtol=2e-4)


def test_predictor_on_mesh():
    from duoformer_tcga_tpu.parallel import mesh as mesh_lib

    oracle, model = _small_pair(seed=2)
    params = model.init(jax.random.PRNGKey(0))
    mesh = mesh_lib.make_mesh(platform="cpu")
    pred = Predictor(model, params, mesh=mesh, dtype=jnp.float32)
    tiles = np.random.default_rng(2).integers(
        0, 256, (8, 224, 224, 3), dtype=np.uint8)
    out = np.asarray(pred(tiles))
    assert out.shape == (8, 3)


def test_predictor_embed_is_pre_head_cls():
    """Predictor.embed returns (logits, cls) from ONE forward where the
    embedding is exactly the vector the head consumes: logits must equal
    embedding @ head_w + head_b, and must match plain __call__."""
    from duoformer_tcga_tpu.ops import nn

    _oracle, model = _small_pair(seed=3)
    params = model.init(jax.random.PRNGKey(1))
    pred = Predictor(model, params, dtype=jnp.float32)
    tiles = np.random.default_rng(4).integers(
        0, 256, (2, 224, 224, 3), dtype=np.uint8)

    logits, emb = pred.embed(tiles)
    logits, emb = np.asarray(logits), np.asarray(emb)
    assert emb.shape == (2, 96)

    np.testing.assert_allclose(logits, np.asarray(pred(tiles)),
                               atol=1e-5, rtol=1e-5)
    # Note: Predictor folds params; head is untouched by BN folding.
    want = np.asarray(nn.linear(pred.params["transformer"]["head"],
                                jnp.asarray(emb)))
    np.testing.assert_allclose(logits, want, atol=1e-5, rtol=1e-5)


def test_cli_predict_embeddings_and_by_slide(tmp_path):
    """predict --embeddings=<npz> --by-slide=<csv> on a one-slide-per-
    subfolder layout: tile embeddings land in the npz aligned with the
    tile CSV rows, and the slide CSV aggregates mean-probability per
    subfolder with a consistent vote fraction."""
    import csv as csv_lib

    from PIL import Image

    from duoformer_tcga_tpu import cli

    oracle, model = _small_pair(seed=4)
    ckpt = str(tmp_path / "ref.pt")
    torch.save(oracle.state_dict(), ckpt)

    root = tmp_path / "slides"
    rng = np.random.default_rng(5)
    n_per = {"slideA": 3, "slideB": 2}
    for slide, n in n_per.items():
        d = root / slide
        d.mkdir(parents=True)
        for i in range(n):
            Image.fromarray(rng.integers(0, 256, (224, 224, 3),
                                         dtype=np.uint8)).save(
                str(d / f"t{i}.png"))

    out = tmp_path / "tiles.csv"
    emb_path = tmp_path / "emb.npz"
    slide_path = tmp_path / "slides.csv"
    rc = cli.main([
        "predict", "--preset=release-2scale", "--model.depth=2",
        "--model.embed_dim=96", "--model.proj_dim=96",
        "--model.num_classes=3", "--model.dtype=float32",
        "--train.platform=cpu", "--train.batch_size=4",
        f"--train.checkpoint_dir={tmp_path}/unused",
        f"--torch={ckpt}", f"--input={root}", f"--output={out}",
        f"--embeddings={emb_path}", f"--by-slide={slide_path}",
    ])
    assert rc == 0

    with open(out) as f:
        tile_rows = list(csv_lib.reader(f))[1:]
    assert len(tile_rows) == 5

    z = np.load(emb_path)
    assert z["embeddings"].shape == (5, 96)
    assert list(z["paths"]) == [r[0] for r in tile_rows]
    # embeddings reproduce the CSV probabilities through the head
    from duoformer_tcga_tpu.inference import from_torch_checkpoint as ftc
    pred = ftc(model, ckpt, dtype=jnp.float32)
    from duoformer_tcga_tpu.ops import nn
    relogit = np.asarray(nn.linear(pred.params["transformer"]["head"],
                                   jnp.asarray(z["embeddings"])))
    reprobs = np.asarray(jax.nn.softmax(jnp.asarray(relogit), axis=-1))
    csv_probs = np.array([[float(x) for x in r[2:]] for r in tile_rows])
    np.testing.assert_allclose(reprobs, csv_probs, atol=1e-4)

    with open(slide_path) as f:
        srows = list(csv_lib.reader(f))
    header, srows = srows[0], srows[1:]
    assert header[:4] == ["slide", "n_tiles", "pred", "vote_fraction"]
    got = {r[0]: r for r in srows}
    assert set(got) == set(n_per)
    for slide, n in n_per.items():
        row = got[slide]
        assert int(row[1]) == n
        mask = np.array([r[0].split("/")[-2] == slide for r in tile_rows])
        mean_pr = csv_probs[mask].mean(axis=0)
        assert int(row[2]) == int(mean_pr.argmax())
        np.testing.assert_allclose(
            [float(x) for x in row[4:]], mean_pr, atol=1e-5)
        votes = np.array([int(r[1]) for r in tile_rows])[mask]
        want_vote = (votes == int(row[2])).mean()
        assert abs(float(row[3]) - want_vote) < 1e-4


def test_cli_predict_from_torch_checkpoint(tmp_path):
    """`predict --torch=<ckpt.pt>`: a reference torch checkpoint serves
    directly through the CLI, matching from_torch_checkpoint's logits."""
    from PIL import Image

    from duoformer_tcga_tpu import cli

    oracle, model = _small_pair(seed=2)
    ckpt = str(tmp_path / "ref.pt")
    torch.save(oracle.state_dict(), ckpt)

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    rng = np.random.default_rng(3)
    tiles = rng.integers(0, 256, (3, 224, 224, 3), dtype=np.uint8)
    for i, t in enumerate(tiles):
        Image.fromarray(t).save(str(imgs / f"t{i}.png"))

    out = tmp_path / "p.csv"
    rc = cli.main([
        "predict", "--preset=release-2scale", "--model.depth=2",
        "--model.embed_dim=96", "--model.proj_dim=96",
        "--model.num_classes=3", "--model.dtype=float32",
        "--train.platform=cpu", "--train.batch_size=8",
        f"--train.checkpoint_dir={tmp_path}/unused",
        f"--torch={ckpt}", f"--input={imgs}", f"--output={out}",
    ])
    assert rc == 0
    lines = out.read_text().strip().split("\n")
    assert len(lines) == 4

    pred = from_torch_checkpoint(model, ckpt, dtype=jnp.float32)
    # CSV rows are sorted by filename = tile order here
    want = np.asarray(pred.predict_proba(tiles))
    got = np.array([[float(x) for x in l.split(",")[2:]]
                    for l in lines[1:]])
    np.testing.assert_allclose(got, want, atol=1e-4)
