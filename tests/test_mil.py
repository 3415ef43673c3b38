"""Slide-level gated-attention MIL (models/mil.py, mil.py, cli
mil-train/mil-predict). The reference has no slide-level learner at all
(its evaluation() scores tiles independently, main_toy.py:39-54); this
is the standard downstream aggregator (Ilse et al. 2018) over the
exported tile embeddings."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from duoformer_tcga_tpu import mil as mil_lib
from duoformer_tcga_tpu.models.mil import GatedAttentionMIL


def _toy_bags(n_slides=40, tiles=32, dim=16, seed=0):
    """Classic MIL toy: every bag is noise; POSITIVE bags also contain
    1-3 'key instance' tiles carrying a fixed signature direction. The
    bag label is learnable only through instance attention."""
    rng = np.random.default_rng(seed)
    sig = rng.normal(size=(dim,)).astype(np.float32)
    sig /= np.linalg.norm(sig)
    bags, labels, key_idx = [], [], []
    for i in range(n_slides):
        n = int(rng.integers(tiles // 2, tiles + 1))
        b = rng.normal(scale=0.3, size=(n, dim)).astype(np.float32)
        y = i % 2
        keys = []
        if y == 1:
            for j in rng.choice(n, size=int(rng.integers(1, 4)),
                                replace=False):
                b[j] += 3.0 * sig
                keys.append(int(j))
        bags.append(b)
        labels.append(y)
        key_idx.append(keys)
    return bags, np.asarray(labels, np.int32), key_idx


def test_mil_padding_invariance():
    """Extra padded rows must not change the logits at all (masked
    softmax exactness)."""
    model = GatedAttentionMIL(embed_dim=8, hidden=16, num_classes=3)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    e = rng.normal(size=(2, 5, 8)).astype(np.float32)
    m = np.ones((2, 5), np.float32)
    m[1, 3:] = 0.0
    base = np.asarray(model.apply(params, jnp.asarray(e), jnp.asarray(m)))
    # pad 7 more garbage rows
    e2 = np.concatenate(
        [e, rng.normal(size=(2, 7, 8)).astype(np.float32)], axis=1)
    m2 = np.concatenate([m, np.zeros((2, 7), np.float32)], axis=1)
    out = np.asarray(model.apply(params, jnp.asarray(e2), jnp.asarray(m2)))
    np.testing.assert_allclose(out, base, rtol=1e-6, atol=1e-6)


def test_mil_attention_sums_to_one_on_valid():
    model = GatedAttentionMIL(embed_dim=8, hidden=16, num_classes=2)
    params = model.init(jax.random.PRNGKey(0))
    e = np.random.default_rng(2).normal(size=(3, 6, 8)).astype(np.float32)
    m = np.ones((3, 6), np.float32)
    m[0, 2:] = 0.0
    _, attn = model.apply(params, jnp.asarray(e), jnp.asarray(m),
                          with_attention=True)
    attn = np.asarray(attn)
    np.testing.assert_allclose(attn.sum(-1), 1.0, rtol=1e-5)
    assert (attn[0, 2:] == 0).all()


def test_mil_learns_key_instances_and_attends_them():
    """The toy key-instance problem must be solved near-perfectly and
    the attention mass must concentrate on the planted key tiles."""
    bags, labels, key_idx = _toy_bags()
    embs, mask = mil_lib.pad_bags(bags)
    params, report = mil_lib.train_mil(
        embs, mask, labels, num_classes=2, hidden=32, epochs=40,
        lr=3e-3, batch_size=8, val_fraction=0.25, seed=0)
    assert report["val_acc"] >= 0.9, report
    assert report["val_auc"] is None or report["val_auc"] >= 0.9

    model = GatedAttentionMIL(embed_dim=embs.shape[-1], hidden=32,
                              num_classes=2)
    _, attn = model.apply(params, jnp.asarray(embs), jnp.asarray(mask),
                          with_attention=True)
    attn = np.asarray(attn)
    # on positive slides, the planted keys should dominate attention
    fracs = [attn[i, key_idx[i]].sum()
             for i in range(len(bags)) if key_idx[i]]
    assert np.mean(fracs) > 0.5, np.mean(fracs)


def test_mil_artifact_roundtrip(tmp_path):
    bags, labels, _ = _toy_bags(n_slides=8, tiles=6, dim=8, seed=3)
    embs, mask = mil_lib.pad_bags(bags)
    model = GatedAttentionMIL(embed_dim=8, hidden=16, num_classes=2)
    params = model.init(jax.random.PRNGKey(1))
    path = str(tmp_path / "mil.npz")
    mil_lib.save_mil(path, jax.tree.map(np.asarray, params),
                     ["neg", "pos"], hidden=16, report={"val_acc": 1.0})
    model2, params2, meta = mil_lib.load_mil(path)
    assert meta["classes"] == ["neg", "pos"]
    assert meta["report"]["val_acc"] == 1.0
    a = np.asarray(model.apply(params, jnp.asarray(embs),
                               jnp.asarray(mask)))
    b = np.asarray(model2.apply(params2, jnp.asarray(embs),
                                jnp.asarray(mask)))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_mil_kfold_indices_partition():
    """Every slide lands in exactly one val fold; folds are stratified
    (each fold's val side sees every class with >= folds slides); splits
    are deterministic in the seed."""
    labels = np.asarray([0] * 9 + [1] * 6, np.int32)
    splits = mil_lib.kfold_indices(labels, 3, seed=7)
    seen = np.concatenate([va for _, va in splits])
    assert sorted(seen.tolist()) == list(range(len(labels)))
    for tr, va in splits:
        assert not set(tr) & set(va)
        assert set(labels[va]) == {0, 1}
        assert set(labels[tr]) == {0, 1}
    again = mil_lib.kfold_indices(labels, 3, seed=7)
    for (a, b), (c, d) in zip(splits, again):
        np.testing.assert_array_equal(a, c)
        np.testing.assert_array_equal(b, d)
    with pytest.raises(ValueError, match="folds"):
        mil_lib.kfold_indices(labels, 1)
    with pytest.raises(ValueError, match="slides"):
        mil_lib.kfold_indices(np.asarray([0, 1]), 3)


def test_mil_kfold_remainders_spread():
    """Per-class round-robin starts rotate, so (a) remainder slides do
    not pile onto fold 0 and (b) several small classes (each < folds
    slides) still yield a full valid partition instead of an empty
    last fold."""
    # four classes of 4 slides, 3 folds: naive (offset-0) assignment
    # gives val sizes [8, 4, 4]; rotated gives a 6/5/5 spread
    labels = np.asarray([0] * 4 + [1] * 4 + [2] * 4 + [3] * 4, np.int32)
    sizes = sorted(len(va) for _, va in
                   mil_lib.kfold_indices(labels, 3, seed=0))
    assert sizes == [5, 5, 6]
    # three singleton classes + one big class, 3 folds: offset-0 would
    # put all singletons in fold 0 and leave fold 2 val-degenerate for
    # them; rotation spreads one singleton per fold
    labels = np.asarray([0, 1, 2] + [3] * 9, np.int32)
    splits = mil_lib.kfold_indices(labels, 3, seed=1)
    singleton_folds = []
    for f, (_, va) in enumerate(splits):
        assert 3 <= len(va) <= 5
        singleton_folds += [f for s in (0, 1, 2) if s in labels[va]]
    assert sorted(singleton_folds) == [0, 1, 2]


def test_mil_crossval():
    """K-fold CV on the separable toy solves every fold and reports
    mean/std over folds."""
    bags, labels, _ = _toy_bags(n_slides=30, tiles=16, dim=16, seed=6)
    embs, mask = mil_lib.pad_bags(bags)
    cv = mil_lib.crossval_mil(embs, mask, labels, num_classes=2, folds=3,
                              hidden=32, epochs=50, lr=3e-3, batch_size=8)
    assert cv["folds"] == 3 and len(cv["per_fold"]) == 3
    # every fold validates on a disjoint slide subset of the right size
    assert sum(r["val_slides"] for r in cv["per_fold"]) == len(bags)
    assert cv["val_acc_mean"] >= 0.8, cv
    assert 0.0 <= cv["val_acc_std"] <= 0.5
    assert "val_auc_mean" in cv


def _write_embeddings_npz(path, bags, cls_names, slide_ids):
    paths, rows = [], []
    for bag, cls, sid in zip(bags, cls_names, slide_ids):
        for t in range(len(bag)):
            paths.append(os.path.join("/data", cls, sid, f"t{t}.png"))
            rows.append(bag[t])
    np.savez(path, paths=np.array(paths),
             embeddings=np.stack(rows).astype(np.float32))


def test_load_bags_grouping(tmp_path):
    bags, labels, _ = _toy_bags(n_slides=6, tiles=5, dim=4, seed=4)
    cls_names = ["pos" if y else "neg" for y in labels]
    sids = [f"s{i}" for i in range(len(bags))]
    path = str(tmp_path / "emb.npz")
    _write_embeddings_npz(path, bags, cls_names, sids)
    ids, cls_out, bags_out, classes = mil_lib.load_bags(path)
    assert classes == ["neg", "pos"]
    assert len(ids) == 6
    got = {os.path.basename(i): (c, len(b))
           for i, c, b in zip(ids, cls_out, bags_out)}
    for i, (cls, bag) in enumerate(zip(cls_names, bags)):
        assert got[f"s{i}"] == (cls, len(bag))
    # flat layout (no class dir) is rejected for training
    flat = str(tmp_path / "flat.npz")
    np.savez(flat, paths=np.array(["t0.png", "t1.png"]),
             embeddings=np.zeros((2, 4), np.float32))
    with pytest.raises(ValueError, match="class"):
        mil_lib.load_bags(flat)


def test_cli_mil_train_and_predict(tmp_path, capsys):
    from duoformer_tcga_tpu import cli

    bags, labels, _ = _toy_bags(n_slides=24, tiles=12, dim=8, seed=5)
    cls_names = ["pos" if y else "neg" for y in labels]
    sids = [f"s{i}" for i in range(len(bags))]
    emb = str(tmp_path / "emb.npz")
    _write_embeddings_npz(emb, bags, cls_names, sids)
    milp = str(tmp_path / "mil.npz")
    rc = cli.main(["mil-train", f"--embeddings={emb}", f"--output={milp}",
                   "--hidden=16", "--epochs=20", "--batch-size=8",
                   "--folds=2"])
    assert rc == 0 and os.path.exists(milp)
    assert "crossval (2 folds): val_acc" in capsys.readouterr().out
    _, _, meta = mil_lib.load_mil(milp)
    assert meta["report"]["crossval"]["folds"] == 2
    out_csv = str(tmp_path / "slides.csv")
    attn_npz = str(tmp_path / "attn.npz")
    rc = cli.main(["mil-predict", f"--embeddings={emb}", f"--mil={milp}",
                   f"--output={out_csv}", f"--attn={attn_npz}"])
    assert rc == 0
    import csv
    with open(out_csv) as f:
        rows = list(csv.reader(f))
    assert rows[0][:3] == ["slide", "n_tiles", "pred"]
    assert len(rows) == 1 + len(bags)
    att = np.load(attn_npz)
    assert att["attention"].shape[0] == len(bags)
    np.testing.assert_allclose(att["attention"].sum(-1), 1.0, rtol=1e-4)