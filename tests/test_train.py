"""Optimizer/schedule semantics vs torch oracles + mini-backbone shapes."""

import numpy as np
import torch

import jax
import jax.numpy as jnp
import optax

from duoformer_tcga_tpu import train as train_lib
from duoformer_tcga_tpu.models.mini_backbone import MiniBackbone


class TestAdamParity:
    def test_matches_torch_adam_l2(self):
        """optax chain == torch.optim.Adam(weight_decay=wd) for several
        steps (reference optimizer, main_toy.py:111)."""
        torch.manual_seed(0)
        w0 = torch.randn(4, 3)
        lin = torch.nn.Parameter(w0.clone())
        opt_t = torch.optim.Adam([lin], lr=1e-3, weight_decay=1e-2)

        params = {"w": jnp.asarray(w0.numpy())}
        opt_j = train_lib.make_optimizer(lambda _: 1e-3, weight_decay=1e-2)
        state = opt_j.init(params)

        x = torch.randn(5, 4)
        for _ in range(4):
            # identical quadratic loss: 0.5*sum((x @ w)^2)
            opt_t.zero_grad()
            loss_t = 0.5 * (x @ lin).pow(2).sum()
            loss_t.backward()
            opt_t.step()

            g = jax.grad(
                lambda p: 0.5 * jnp.sum((jnp.asarray(x.numpy()) @ p["w"]) ** 2)
            )(params)
            updates, state = opt_j.update(g, state, params)
            params = optax.apply_updates(params, updates)

        np.testing.assert_allclose(np.asarray(params["w"]),
                                   lin.detach().numpy(), atol=1e-5, rtol=1e-5)

    def test_onecycle_matches_torch(self):
        """cosine OneCycle schedule vs torch.optim.lr_scheduler.OneCycleLR.

        torch normalizes phase progress by (phase_len - 1), optax by
        phase_len — a fencepost difference that vanishes as total grows;
        compare on a realistic horizon."""
        total = 1000
        lr = 1e-3
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=lr)
        sched_t = torch.optim.lr_scheduler.OneCycleLR(
            opt, max_lr=lr, total_steps=total)
        sched_j = train_lib.onecycle_schedule(lr, total)
        for step in range(total):
            lr_t = opt.param_groups[0]["lr"]
            lr_j = float(sched_j(step))
            np.testing.assert_allclose(lr_j, lr_t, rtol=2e-2, atol=2e-6)
            opt.step()
            sched_t.step()
        # endpoints: initial = peak/div_factor, peak at pct_start
        np.testing.assert_allclose(float(sched_j(0)), lr / 25, rtol=1e-3)
        np.testing.assert_allclose(float(sched_j(300)), lr, rtol=1e-3)


class TestScheduleGuards:
    def test_onecycle_finite_for_tiny_totals(self):
        """optax cosine_onecycle NaNs for total_steps<=3; ours must not."""
        for total in (1, 2, 3, 4):
            s = train_lib.onecycle_schedule(1e-4, total)
            for i in range(total + 1):
                assert np.isfinite(float(s(i))), (total, i)


class TestFrozenPartition:
    def test_set_to_zero_blocks_decay(self):
        params = {"backbone": {"w": jnp.ones((2,))},
                  "transformer": {"w": jnp.ones((2,))}}
        opt = train_lib.make_optimizer(
            lambda _: 1e-2, weight_decay=0.1,
            frozen_label_fn=train_lib.backbone_frozen_labels)
        state = opt.init(params)
        grads = {"backbone": {"w": jnp.zeros((2,))},
                 "transformer": {"w": jnp.zeros((2,))}}
        updates, _ = opt.update(grads, state, params)
        # frozen subtree: exactly zero update even with weight decay
        assert float(jnp.abs(updates["backbone"]["w"]).max()) == 0.0
        # trainable subtree: decay produces nonzero update
        assert float(jnp.abs(updates["transformer"]["w"]).max()) > 0.0


class TestMiniBackbone:
    def test_backbone3_shapes(self):
        m = MiniBackbone(3)
        params = m.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 224, 224, 3))
        x1, x2, x3 = jax.jit(lambda p, v: m.apply(p, v))(params, x)
        assert x1.shape == (1, 28, 28, 512)
        assert x2.shape == (1, 14, 14, 1024)
        assert x3.shape == (1, 7, 7, 2048)

    def test_backbone2_shapes(self):
        m = MiniBackbone(2)
        params = m.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 224, 224, 3))
        x1, x2 = jax.jit(lambda p, v: m.apply(p, v))(params, x)
        assert x1.shape == (1, 28, 28, 512)
        assert x2.shape == (1, 14, 14, 1024)


def test_frozen_stop_grad_step_identical():
    """make_train_step(frozen_label_fn=...) stop-gradients the frozen
    subtree so the backbone backward is pruned by construction (not by
    relying on XLA DCE through set_to_zero) — the resulting state must
    be IDENTICAL to the unpruned step."""
    import numpy as np
    import duoformer_tcga_tpu as dft

    model = dft.build_model_no_extra_params(
        num_classes=2, num_layers=2, embed_dim=96, proj_dim=96,
        num_heads=12, depth=1)
    sched = train_lib.onecycle_schedule(1e-3, total_steps=10)
    opt = train_lib.make_optimizer(
        sched, weight_decay=1e-4,
        frozen_label_fn=train_lib.backbone_frozen_labels)
    state = train_lib.init_train_state(model, jax.random.PRNGKey(0), opt)
    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(1), (2, 224, 224, 3)),
        "label": jnp.array([0, 1], jnp.int32),
    }
    rng = jax.random.PRNGKey(2)

    ref_step = train_lib.make_train_step(model, opt, donate=False)
    new_step = train_lib.make_train_step(
        model, opt, donate=False,
        frozen_label_fn=train_lib.backbone_frozen_labels)
    s_ref, m_ref = ref_step(state, batch, rng)
    s_new, m_new = new_step(state, batch, rng)
    assert float(m_ref["loss"]) == float(m_new["loss"])
    for a, b in zip(jax.tree.leaves(s_ref["params"]),
                    jax.tree.leaves(s_new["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_legacy_family_train_step():
    """One train step through the legacy (inherited-ViT core) family:
    finite loss, trainable transformer params move, frozen backbone
    untouched — the reference's MyModel is trainable here even though its
    own driver cannot run (Q1-Q3)."""
    import duoformer_tcga_tpu as dft

    model = dft.build_model(num_classes=2, num_layers=2, embed_dim=96,
                            proj_dim=96, num_heads=12, depth=2,
                            pretrained=False)
    sched = train_lib.onecycle_schedule(1e-3, total_steps=10)
    opt = train_lib.make_optimizer(
        sched, weight_decay=1e-4,
        frozen_label_fn=train_lib.backbone_frozen_labels)
    state = train_lib.init_train_state(model, jax.random.PRNGKey(0), opt)
    p0 = jax.tree.map(np.asarray, state["params"])
    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(1), (2, 224, 224, 3)),
        "label": jnp.array([0, 1], jnp.int32),
    }
    step = train_lib.make_train_step(model, opt, donate=False)
    state2, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    for a, b in zip(jax.tree.leaves(p0["backbone"]),
                    jax.tree.leaves(jax.tree.map(np.asarray,
                                                 state2["params"]["backbone"]))):
        np.testing.assert_array_equal(a, b)
    moved = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(p0["transformer"]),
                        jax.tree.leaves(state2["params"]["transformer"])))
    assert moved
