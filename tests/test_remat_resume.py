"""Rematerialization correctness + deterministic checkpoint-resume."""

import numpy as np

import jax
import jax.numpy as jnp

import duoformer_tcga_tpu as dft
from duoformer_tcga_tpu import train as train_lib


def _model(remat=False):
    return dft.build_model_no_extra_params(
        num_classes=2, num_layers=2, embed_dim=96, proj_dim=96,
        num_heads=12, depth=2, dtype=jnp.float32, remat=remat)


def test_remat_same_loss_and_grads():
    m0, m1 = _model(False), _model(True)
    params = m0.init(jax.random.PRNGKey(0))
    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(1), (2, 224, 224, 3)),
        "label": jnp.array([0, 1], jnp.int32),
    }

    def loss(model, p):
        logits = model.apply(p, batch["image"], train=True)
        return train_lib.cross_entropy(logits, batch["label"])

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_resume_is_deterministic(tmp_path):
    """4 straight steps == 2 steps + checkpoint/restore + 2 steps."""
    from duoformer_tcga_tpu.utils.checkpoint import CheckpointManager

    model = _model()
    opt = train_lib.make_optimizer(
        train_lib.onecycle_schedule(1e-3, 10), weight_decay=1e-4,
        frozen_label_fn=train_lib.backbone_frozen_labels)
    step = train_lib.make_train_step(model, opt, donate=False)
    rng = jax.random.PRNGKey(7)

    def batch_for(i):
        k = jax.random.PRNGKey(100 + i)
        return {"image": jax.random.normal(k, (2, 224, 224, 3)),
                "label": jnp.array([i % 2, (i + 1) % 2], jnp.int32)}

    # straight run
    s = train_lib.init_train_state(model, jax.random.PRNGKey(0), opt)
    for i in range(4):
        s, _ = step(s, batch_for(i), rng)
    ref = jax.device_get(s["params"])

    # interrupted run
    s = train_lib.init_train_state(model, jax.random.PRNGKey(0), opt)
    for i in range(2):
        s, _ = step(s, batch_for(i), rng)
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(2, jax.device_get(s))
    mgr.wait()
    s2 = mgr.restore(jax.device_get(s))
    mgr.close()
    for i in range(2, 4):
        s2, _ = step(s2, batch_for(i), rng)
    out = jax.device_get(s2["params"])

    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
