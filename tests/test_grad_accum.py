"""Gradient accumulation (make_train_step(accum_steps=N)): one update
from N sequential microbatches must match the full-batch update exactly
(CE is a mean over examples; equal microbatches keep the mean exact)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import duoformer_tcga_tpu as dft
from duoformer_tcga_tpu import train as train_lib


def _setup():
    model = dft.build_model_no_extra_params(
        num_classes=2, num_layers=2, embed_dim=96, proj_dim=96,
        num_heads=12, depth=2)
    sched = train_lib.onecycle_schedule(1e-3, total_steps=10)
    opt = train_lib.make_optimizer(
        sched, weight_decay=1e-4,
        frozen_label_fn=train_lib.backbone_frozen_labels)
    state = train_lib.init_train_state(model, jax.random.PRNGKey(0), opt)
    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(1), (8, 224, 224, 3)),
        "label": jnp.array([0, 1] * 4, jnp.int32),
    }
    return model, opt, state, batch


def test_accum_matches_full_batch():
    model, opt, state, batch = _setup()
    rng = jax.random.PRNGKey(2)

    results = []
    for accum in (1, 4):
        step = train_lib.make_train_step(model, opt, donate=False,
                                         accum_steps=accum)
        st, metrics = step(state, batch, rng)
        results.append((jax.tree.map(np.asarray, st["params"]),
                        float(metrics["loss"]),
                        float(metrics["accuracy"])))

    (p1, l1, a1), (p4, l4, a4) = results
    assert abs(l1 - l4) < 1e-5 and abs(a1 - a4) < 1e-6
    flat1, _ = jax.tree_util.tree_flatten_with_path(p1)
    flat4, _ = jax.tree_util.tree_flatten_with_path(p4)
    for (path, a), (_, b) in zip(flat1, flat4):
        np.testing.assert_allclose(
            a, b, atol=2e-6, rtol=2e-6,
            err_msg=jax.tree_util.keystr(path))


def test_accum_matches_full_batch_with_class_weights():
    """Weighted CE normalizes by the summed sample weights, so exactness
    needs the weight-mass recombination (not a plain mean of microbatch
    grads) — deliberately unbalanced labels across microbatches."""
    model, opt, state, batch = _setup()
    batch = dict(batch, label=jnp.array([0, 0, 0, 1, 1, 0, 0, 0],
                                        jnp.int32))
    rng = jax.random.PRNGKey(2)
    w = jnp.array([1.0, 4.0], jnp.float32)

    results = []
    for accum in (1, 4):
        step = train_lib.make_train_step(model, opt, donate=False,
                                         accum_steps=accum,
                                         class_weights=w)
        st, metrics = step(state, batch, rng)
        results.append((jax.tree.map(np.asarray, st["params"]),
                        float(metrics["loss"])))

    (p1, l1), (p4, l4) = results
    assert abs(l1 - l4) < 1e-5
    flat1, _ = jax.tree_util.tree_flatten_with_path(p1)
    flat4, _ = jax.tree_util.tree_flatten_with_path(p4)
    for (path, a), (_, b) in zip(flat1, flat4):
        np.testing.assert_allclose(
            a, b, atol=2e-6, rtol=2e-6,
            err_msg=jax.tree_util.keystr(path))


def test_accum_rejects_bn_stats():
    model, opt, state, batch = _setup()
    with pytest.raises(ValueError, match="accum_steps"):
        train_lib.make_train_step(model, opt, bn_stats=True, accum_steps=2)


def test_accum_rejects_indivisible_batch():
    model, opt, state, batch = _setup()
    step = train_lib.make_train_step(model, opt, donate=False,
                                     accum_steps=3)
    with pytest.raises(ValueError, match="accum_steps=3 must divide"):
        step(state, batch, jax.random.PRNGKey(2))
