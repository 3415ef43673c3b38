"""End-to-end learning: the training machinery (loss, grads through
frozen-trunk stop_gradient, Adam+schedule, data pipeline) must learn a
learnable synthetic task.

Model: ResNet50withFC (the SSL linear-probe family, resnet50ssl.py:104-123)
— a frozen random trunk preserves the color-tint signal linearly
(verified: a normalized linear probe separates it perfectly), so the
trainable fc must reach high accuracy quickly. The full DuoFormer is
intentionally NOT used here: at random init its residual-free patch chain
makes early learning extremely slow (documented in docs/performance.md),
which would test the architecture, not the framework.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from duoformer_tcga_tpu import train as train_lib
from duoformer_tcga_tpu.data import pipeline as data_lib
from duoformer_tcga_tpu.models.resnet import ResNet50withFC


@pytest.mark.slow
def test_training_learns_tint_task():
    model = ResNet50withFC(num_classes=2, dtype=jnp.float32)

    def apply(params, x, rng=None, train=False):
        # bn_batch_stats=True is the reference's train-mode BN behavior
        # for frozen trunks and conditions the random trunk's activations
        return model.apply(params, x, train=train, freeze=True,
                           bn_batch_stats=True)

    model_like = type("M", (), {"apply": staticmethod(apply)})()
    opt = train_lib.make_optimizer(
        train_lib.onecycle_schedule(1e-2, 150), weight_decay=1e-4,
        frozen_label_fn=lambda p: {
            "trunk": jax.tree.map(lambda _: "frozen", p["trunk"]),
            "fc": jax.tree.map(lambda _: "train", p["fc"]),
        })
    state = train_lib.init_train_state(model, jax.random.PRNGKey(0), opt)
    step = train_lib.make_train_step(model_like, opt, donate=False)
    rng = jax.random.PRNGKey(1)

    accs = []
    gen = data_lib.synthetic_tiles(16, 2, seed=0, learnable=True)
    for i, raw in zip(range(150), gen):
        batch = {
            "image": data_lib.preprocess_tiles(jnp.asarray(raw["image"]),
                                               dtype=jnp.float32),
            "label": jnp.asarray(raw["label"]),
        }
        state, m = step(state, batch, rng)
        accs.append(float(m["accuracy"]))
    late = np.mean(accs[-20:])
    assert late > 0.8, f"did not learn: late acc {late:.2f} ({accs[-20:]})"
    # trunk untouched
    p0 = ResNet50withFC(num_classes=2, dtype=jnp.float32).init(
        jax.random.PRNGKey(0))
    for a, b in zip(jax.tree.leaves(p0["trunk"]),
                    jax.tree.leaves(state["params"]["trunk"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
