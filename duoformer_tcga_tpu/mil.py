"""Slide-level MIL training over exported tile embeddings.

Workflow (the slide-level story the reference leaves to offline
averaging — its evaluation() scores tiles only, main_toy.py:39-54):

    cli predict --input=tiles/ --embeddings=emb.npz     # tile CLS reps
    cli mil-train --embeddings=emb.npz --output=mil.npz # learned bags
    cli mil-predict --embeddings=new.npz --mil=mil.npz  # slide calls
                                                        #  + attention

Bags come from the nested class/slide/tile folder layout (the same
convention `--by-slide` groups on): a tile path's parent directory is
the slide, its grandparent the class label. Slides are padded to the
cohort's max tile count and batched on fixed shapes; the model's masked
softmax makes padding exact (models/mil.py).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .models.mil import GatedAttentionMIL


# -- bags from the embeddings npz --------------------------------------------


def load_bags(path: str, labeled: bool = True
              ) -> Tuple[List[str], List[str], List[np.ndarray],
                         List[str]]:
    """embeddings npz (paths + embeddings, cmd_predict --embeddings=) ->
    (slide_ids, slide_classes, per-slide [n_i, D] arrays, class names).
    Grouping: tile parent dir = slide, grandparent = class. With
    labeled=False (prediction on unlabeled cohorts) classes may be
    empty/unknown and no class-count check applies."""
    data = np.load(path, allow_pickle=False)
    if "paths" not in data or "embeddings" not in data:
        raise ValueError(f"{path} is not an embeddings export (need "
                         f"'paths' + 'embeddings' arrays — produce it "
                         f"with `cli predict --embeddings=`)")
    paths = [str(p) for p in data["paths"]]
    embs = np.asarray(data["embeddings"], np.float32)
    slides: Dict[str, List[int]] = {}
    slide_cls: Dict[str, str] = {}
    for i, p in enumerate(paths):
        parent = os.path.dirname(p)
        cls = os.path.basename(os.path.dirname(parent))
        if labeled and not cls:
            raise ValueError(
                f"tile path {p!r} is not in the nested class/slide/tile "
                f"layout — MIL training needs slide bags with class "
                f"labels")
        slides.setdefault(parent, []).append(i)
        slide_cls[parent] = cls
    classes = sorted(c for c in set(slide_cls.values()) if c)
    if labeled and len(classes) < 2:
        raise ValueError(f"found {len(classes)} class(es) "
                         f"({classes}) — MIL training needs >= 2")
    ids = sorted(slides)
    return (ids, [slide_cls[s] for s in ids],
            [embs[np.asarray(slides[s])] for s in ids], classes)


def pad_bags(bags: List[np.ndarray],
             max_tiles: Optional[int] = None
             ) -> Tuple[np.ndarray, np.ndarray]:
    """list of [n_i, D] -> (embs [B, N, D], mask [B, N]). Bags larger
    than max_tiles are truncated (deterministically, head) — cap the
    cohort with max_tiles when HBM demands it."""
    N = max(len(b) for b in bags)
    if max_tiles is not None:
        N = min(N, int(max_tiles))
    D = bags[0].shape[1]
    out = np.zeros((len(bags), N, D), np.float32)
    mask = np.zeros((len(bags), N), np.float32)
    for i, b in enumerate(bags):
        n = min(len(b), N)
        out[i, :n] = b[:n]
        mask[i, :n] = 1.0
    return out, mask


def _stratified_split(labels: np.ndarray, val_fraction: float, seed: int
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-class shuffled split -> (train_idx, val_idx); every class
    keeps at least one slide on each side when it has >= 2."""
    rng = np.random.default_rng(seed)
    tr, va = [], []
    for c in np.unique(labels):
        idx = rng.permutation(np.where(labels == c)[0])
        k = int(round(len(idx) * val_fraction))
        k = min(max(k, 1 if len(idx) > 1 else 0), len(idx) - 1)
        va.extend(idx[:k])
        tr.extend(idx[k:])
    return np.sort(np.asarray(tr, np.int64)), np.sort(
        np.asarray(va, np.int64))


def kfold_indices(labels: np.ndarray, folds: int, seed: int = 0
                  ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Deterministic stratified K-fold over slides -> [(train_idx,
    val_idx)] with every slide in exactly one val fold. Same scheme as
    the tile-level `data.folder.fold_indices`: per-class seeded shuffle,
    round-robin fold assignment — every fold's val side sees every class
    that has >= folds slides."""
    if folds < 2:
        raise ValueError(f"--folds={folds}: need >= 2")
    labels = np.asarray(labels)
    if folds > len(labels):
        raise ValueError(f"--folds={folds} but only {len(labels)} slides")
    rng = np.random.default_rng(seed)
    assign = np.empty(len(labels), np.int64)
    offset = 0            # rotate the round-robin start per class so
    for c in np.unique(labels):   # remainder slides spread across folds
        idx = rng.permutation(np.where(labels == c)[0])
        assign[idx] = (np.arange(len(idx)) + offset) % folds
        offset += len(idx)
    out = []
    for f in range(folds):
        va = np.where(assign == f)[0]
        tr = np.where(assign != f)[0]
        if not len(va) or not len(tr):
            raise ValueError(f"fold {f}/{folds} is degenerate "
                             f"({len(tr)} train / {len(va)} val slides)")
        out.append((tr, va))
    return out


# -- training ----------------------------------------------------------------


def make_mil_train_step(model: GatedAttentionMIL, optimizer):
    """(state, embs [B,N,D], mask [B,N], labels [B], weights [B]) ->
    (state, metrics). `weights` zero out padded slides in partial
    batches — the weighted CE mean stays exact."""
    import optax

    def loss_fn(params, embs, mask, labels, weights):
        logits = model.apply(params, embs, mask)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        ce = -jnp.take_along_axis(
            logp, jnp.maximum(labels, 0)[:, None], axis=1)[:, 0]
        wsum = jnp.maximum(weights.sum(), 1e-8)
        loss = (ce * weights).sum() / wsum
        correct = ((logits.argmax(-1) == labels) * weights).sum() / wsum
        return loss, correct

    def step(state, embs, mask, labels, weights):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], embs, mask, labels, weights)
        updates, opt_state = optimizer.update(grads, state["opt_state"],
                                              state["params"])
        params = optax.apply_updates(state["params"], updates)
        return ({"params": params, "opt_state": opt_state},
                {"loss": loss, "accuracy": acc})

    return jax.jit(step, donate_argnums=(0,))


def _auc_binary(scores: np.ndarray, labels: np.ndarray) -> Optional[float]:
    """Rank-statistic ROC-AUC for the positive class (binary only)."""
    pos, neg = scores[labels == 1], scores[labels == 0]
    if not len(pos) or not len(neg):
        return None
    order = np.argsort(np.concatenate([neg, pos]), kind="mergesort")
    ranks = np.empty(len(order), np.float64)
    ranks[order] = np.arange(1, len(order) + 1)
    # midranks for ties
    allv = np.concatenate([neg, pos])
    for v in np.unique(allv):
        sel = allv == v
        ranks[sel] = ranks[sel].mean()
    r_pos = ranks[len(neg):].sum()
    n1, n0 = float(len(pos)), float(len(neg))
    return float((r_pos - n1 * (n1 + 1) / 2) / (n1 * n0))


def train_mil(embs: np.ndarray, mask: np.ndarray, labels: np.ndarray,
              num_classes: int, *, hidden: int = 128, epochs: int = 60,
              lr: float = 1e-3, weight_decay: float = 1e-4,
              batch_size: int = 16, val_fraction: float = 0.2,
              seed: int = 0, verbose: bool = False,
              split: Optional[Tuple[np.ndarray, np.ndarray]] = None,
              select: str = "best") -> Tuple[Dict, Dict]:
    """Train gated-attention MIL on padded bags; returns (params,
    report). Slide-level stratified train/val split (or an explicit
    (train_idx, val_idx) `split` — the cross-validation hook).
    `select="best"` returns the best-val-acc epoch's params (ties ->
    earliest) — early stopping ON the val fold, so the reported val
    metrics are optimistically biased; `select="final"` returns the
    last epoch's params, the unbiased choice for cross-validation."""
    import optax

    model = GatedAttentionMIL(embed_dim=embs.shape[-1], hidden=hidden,
                              num_classes=num_classes)
    params = model.init(jax.random.PRNGKey(seed))
    optimizer = optax.adamw(lr, weight_decay=weight_decay)
    state = {"params": params, "opt_state": optimizer.init(params)}
    step = make_mil_train_step(model, optimizer)
    fwd = jax.jit(lambda p, e, m: model.apply(p, e, m))

    tr, va = (split if split is not None
              else _stratified_split(labels, val_fraction, seed))
    tr, va = np.asarray(tr, np.int64), np.asarray(va, np.int64)
    B = min(batch_size, len(tr))
    rng = np.random.default_rng(seed + 1)

    def eval_split(params, idx):
        if not len(idx):
            return None, None
        logits = np.asarray(fwd(params, embs[idx], mask[idx]))
        probs = np.asarray(jax.nn.softmax(logits, -1))
        acc = float((logits.argmax(-1) == labels[idx]).mean())
        auc = (_auc_binary(probs[:, 1], labels[idx])
               if num_classes == 2 else None)
        return acc, auc

    best = {"val_acc": -1.0, "params": state["params"], "epoch": -1}
    for epoch in range(epochs):
        order = rng.permutation(tr)
        for i in range(0, len(order), B):
            sel = order[i:i + B]
            w = np.ones((B,), np.float32)
            if len(sel) < B:                    # pad the slide batch
                w[len(sel):] = 0.0
                sel = np.concatenate(
                    [sel, np.zeros((B - len(sel),), np.int64)])
            state, m = step(state, embs[sel], mask[sel],
                            labels[sel].astype(np.int32), w)
        val_acc, val_auc = eval_split(state["params"], va)
        if select == "best" and val_acc is not None \
                and val_acc > best["val_acc"]:
            best = {"val_acc": val_acc,
                    "params": jax.tree.map(np.asarray, state["params"]),
                    "epoch": epoch}
        if verbose:
            print(f"[mil epoch {epoch + 1}/{epochs}] "
                  f"loss={float(m['loss']):.4f} "
                  f"val_acc={val_acc if val_acc is not None else 'n/a'}",
                  flush=True)

    params = best["params"] if best["epoch"] >= 0 else jax.tree.map(
        np.asarray, state["params"])
    train_acc, train_auc = eval_split(params, tr)
    val_acc, val_auc = eval_split(params, va)
    report = {"train_slides": int(len(tr)), "val_slides": int(len(va)),
              "train_acc": train_acc, "val_acc": val_acc,
              "train_auc": train_auc, "val_auc": val_auc,
              # select="final": the returned params ARE the last epoch's
              "best_epoch": (epochs if select == "final"
                             else int(best["epoch"]) + 1),
              "epochs": epochs}
    return params, report


def crossval_mil(embs: np.ndarray, mask: np.ndarray, labels: np.ndarray,
                 num_classes: int, folds: int = 5, *, seed: int = 0,
                 verbose: bool = False, **train_kw) -> Dict:
    """Slide-level stratified K-fold cross-validation of the MIL head
    (the paper's evaluation protocol, at the slide level): train K
    models, each validated on its held-out fold, and report per-fold +
    mean/std val accuracy (and ROC-AUC when binary). Every slide is
    scored exactly once, by the one model that never trained on it."""
    reports = []
    for f, (tr, va) in enumerate(kfold_indices(labels, folds, seed)):
        _, rep = train_mil(embs, mask, labels, num_classes=num_classes,
                           seed=seed + f, split=(tr, va),
                           select="final", **train_kw)
        reports.append(rep)
        if verbose:
            print(f"[mil fold {f + 1}/{folds}] "
                  f"val_acc={rep['val_acc']:.4f} "
                  f"val_auc={rep['val_auc']}", flush=True)
    accs = np.asarray([r["val_acc"] for r in reports], np.float64)
    aucs = [r["val_auc"] for r in reports]
    # sample std (ddof=1): the conventional spread for K-fold reports;
    # kfold_indices enforces folds >= 2 so ddof=1 is always defined
    summary = {"folds": folds,
               "val_acc_mean": float(accs.mean()),
               "val_acc_std": float(accs.std(ddof=1)),
               "per_fold": reports}
    if all(a is not None for a in aucs):
        av = np.asarray(aucs, np.float64)
        summary["val_auc_mean"] = float(av.mean())
        summary["val_auc_std"] = float(av.std(ddof=1))
    return summary


# -- artifact ----------------------------------------------------------------


def save_mil(path: str, params: Dict, classes: List[str],
             hidden: int, report: Optional[Dict] = None) -> None:
    flat = {}

    def _walk(node, prefix=""):
        if isinstance(node, dict):
            for k, v in node.items():
                _walk(v, f"{prefix}{k}/")
        else:
            flat[prefix[:-1]] = np.asarray(node)

    _walk(params)
    meta = {"classes": list(classes), "hidden": int(hidden),
            "embed_dim": int(flat["head/w"].shape[0]),
            "num_classes": int(flat["head/w"].shape[1]),
            "report": report or {}}
    flat["__meta__"] = np.frombuffer(json.dumps(meta).encode(),
                                     dtype=np.uint8)
    np.savez(path, **flat)


def load_mil(path: str) -> Tuple[GatedAttentionMIL, Dict, Dict]:
    """-> (model, params, meta)."""
    raw = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(raw["__meta__"].tobytes()).decode())
    params: Dict = {}
    for k in raw.files:
        if k == "__meta__":
            continue
        node = params
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(raw[k])
    model = GatedAttentionMIL(embed_dim=meta["embed_dim"],
                              hidden=meta["hidden"],
                              num_classes=meta["num_classes"])
    return model, params, meta
