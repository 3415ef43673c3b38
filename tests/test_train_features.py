"""Training-quality features beyond the reference (all opt-in, off =
reference semantics): label smoothing, batch mixup, parameter EMA, and
named LR schedules. Upstream has none of these — its only training knobs
are the main_toy.py literals (/root/reference/main_toy.py:58-82).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

import duoformer_tcga_tpu as dft
from duoformer_tcga_tpu import train as train_lib


class TestLabelSmoothing:
    def test_zero_matches_plain_ce(self):
        k = jax.random.PRNGKey(0)
        logits = jax.random.normal(k, (8, 5))
        labels = jnp.arange(8) % 5
        a = train_lib.cross_entropy(logits, labels)
        b = train_lib.cross_entropy(logits, labels, smoothing=0.0)
        assert float(a) == float(b)

    def test_matches_smoothed_target_ce(self):
        """(1-s)·NLL + s·mean(-logp) == CE against the smoothed
        distribution (1-s)·onehot + s/K."""
        s, K = 0.1, 5
        k = jax.random.PRNGKey(1)
        logits = jax.random.normal(k, (8, K))
        labels = jnp.arange(8) % K
        got = float(train_lib.cross_entropy(logits, labels, smoothing=s))
        logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
        target = (1 - s) * np.eye(K)[np.asarray(labels)] + s / K
        want = float(np.mean(-(target * logp).sum(-1)))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_torch_parity(self):
        import torch
        s = 0.2
        logits = np.random.default_rng(2).normal(size=(6, 4)).astype(
            np.float32)
        labels = np.array([0, 1, 2, 3, 0, 1])
        want = torch.nn.functional.cross_entropy(
            torch.tensor(logits), torch.tensor(labels),
            label_smoothing=s).item()
        got = float(train_lib.cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels), smoothing=s))
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestMixup:
    def test_mix_is_convex_and_dominant(self):
        rng = jax.random.PRNGKey(3)
        x = jax.random.normal(jax.random.PRNGKey(4), (8, 4, 4, 3))
        y = jnp.arange(8) % 2
        mixed, y2, lam = train_lib.mixup_batch(rng, x, y, alpha=0.4)
        lam_f = float(lam)
        assert 0.5 <= lam_f <= 1.0          # folded toward the original
        assert mixed.shape == x.shape and y2.shape == y.shape
        # reconstruct the permutation from the labels is ambiguous; check
        # the convex identity row-wise instead: mixed must lie on the
        # segment between x and SOME row of x with coefficient lam
        m0 = np.asarray(mixed[0])
        cands = [lam_f * np.asarray(x[0]) + (1 - lam_f) * np.asarray(x[j])
                 for j in range(8)]
        assert min(np.abs(m0 - c).max() for c in cands) < 1e-5

    def test_deterministic_given_rng(self):
        rng = jax.random.PRNGKey(5)
        x = jax.random.normal(jax.random.PRNGKey(6), (4, 2, 2, 3))
        y = jnp.arange(4)
        a = train_lib.mixup_batch(rng, x, y, 0.2)
        b = train_lib.mixup_batch(rng, x, y, 0.2)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


@pytest.fixture(scope="module")
def tiny_model():
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    return dft.build_model_no_extra_params(
        num_classes=2, num_layers=2, embed_dim=128, proj_dim=128,
        num_heads=8, depth=1)


def _batch(n=2):
    r = np.random.default_rng(0)
    return {
        "image": jnp.asarray(r.normal(size=(n, 224, 224, 3)),
                             jnp.float32),
        "label": jnp.asarray(r.integers(0, 2, n), jnp.int32),
    }


class TestEMA:
    def test_state_carries_and_updates_ema(self, tiny_model):
        opt = train_lib.make_optimizer(
            lambda _: 1e-2, frozen_label_fn=train_lib.backbone_frozen_labels)
        state = train_lib.init_train_state(
            tiny_model, jax.random.PRNGKey(0), opt, ema=True)
        leaf = lambda s, key: np.asarray(
            s[key]["transformer"]["head"]["w"])
        p0 = leaf(state, "params")
        np.testing.assert_array_equal(leaf(state, "ema_params"), p0)

        step = train_lib.make_train_step(
            tiny_model, opt, donate=False,
            frozen_label_fn=train_lib.backbone_frozen_labels, ema=0.5)
        state1, _ = step(state, _batch(), jax.random.PRNGKey(1))
        p1 = leaf(state1, "params")
        assert np.abs(p1 - p0).max() > 0           # the step moved params
        want = 0.5 * p0 + 0.5 * p1
        np.testing.assert_allclose(leaf(state1, "ema_params"), want,
                                   rtol=1e-6, atol=1e-7)

        state2, _ = step(state1, _batch(), jax.random.PRNGKey(1))
        want2 = 0.5 * want + 0.5 * leaf(state2, "params")
        np.testing.assert_allclose(leaf(state2, "ema_params"), want2,
                                   rtol=1e-6, atol=1e-7)

    def test_serving_params_prefers_ema(self):
        s = {"params": {"w": 1}, "ema_params": {"w": 2}}
        assert train_lib.serving_params(s) == {"w": 2}
        assert train_lib.serving_params({"params": {"w": 1}}) == {"w": 1}


class TestRegularizedStepRuns:
    def test_smoothing_mixup_ema_with_accum(self, tiny_model):
        """The full stack composes: smoothing + mixup + EMA + accum in
        one jitted step, finite loss, ema tree present."""
        opt = train_lib.make_optimizer(
            lambda _: 1e-3, frozen_label_fn=train_lib.backbone_frozen_labels)
        state = train_lib.init_train_state(
            tiny_model, jax.random.PRNGKey(0), opt, ema=True)
        step = train_lib.make_train_step(
            tiny_model, opt, donate=False,
            frozen_label_fn=train_lib.backbone_frozen_labels,
            accum_steps=2, label_smoothing=0.1, mixup=0.2, ema=0.99)
        state, metrics = step(state, _batch(4), jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert "ema_params" in state

    def test_mixup_loss_exceeds_nll_floor(self, tiny_model):
        """With mixup the loss is a convex combination over two label
        sets — on random labels it should differ from the plain loss."""
        opt = train_lib.make_optimizer(
            lambda _: 0.0, frozen_label_fn=train_lib.backbone_frozen_labels)
        state = train_lib.init_train_state(
            tiny_model, jax.random.PRNGKey(0), opt)
        plain = train_lib.make_train_step(
            tiny_model, opt, donate=False,
            frozen_label_fn=train_lib.backbone_frozen_labels)
        mixed = train_lib.make_train_step(
            tiny_model, opt, donate=False,
            frozen_label_fn=train_lib.backbone_frozen_labels, mixup=0.3)
        b = _batch(4)
        # force the two streams to see distinguishable labels
        b["label"] = jnp.asarray([0, 1, 0, 1], jnp.int32)
        _, m0 = plain(state, b, jax.random.PRNGKey(2))
        state = train_lib.init_train_state(
            tiny_model, jax.random.PRNGKey(0), opt)
        _, m1 = mixed(state, b, jax.random.PRNGKey(2))
        assert float(m0["loss"]) != float(m1["loss"])


class TestSchedules:
    def test_cosine_warms_up_and_decays(self):
        s = train_lib.make_schedule("cosine", 1e-3, 1000)
        assert float(s(0)) < 1e-4
        peak_step = int(np.argmax([float(s(i)) for i in range(0, 1000, 10)]))
        assert float(s(peak_step * 10)) == pytest.approx(1e-3, rel=1e-2)
        assert float(s(999)) < 1e-5

    def test_constant(self):
        s = train_lib.make_schedule("constant", 3e-4, 10)
        assert float(s(0)) == pytest.approx(3e-4)
        assert float(s(9)) == pytest.approx(3e-4)

    def test_onecycle_dispatch_and_unknown(self):
        s = train_lib.make_schedule("onecycle", 1e-3, 100)
        ref = train_lib.onecycle_schedule(1e-3, 100)
        assert float(s(50)) == float(ref(50))
        with pytest.raises(ValueError, match="schedule"):
            train_lib.make_schedule("linear", 1e-3, 100)


def test_cli_train_with_features_and_ema_eval(tmp_path):
    """End-to-end: train 2 steps with smoothing+mixup+EMA; the checkpoint
    carries ema_params; eval restores it (and prefers the EMA weights)."""
    from duoformer_tcga_tpu import cli, config as config_lib

    args = ["--preset=release-2scale", "--model.depth=1",
            "--model.embed_dim=96", "--model.proj_dim=96",
            "--model.dtype=float32", "--train.platform=cpu",
            "--train.batch_size=8", "--train.label_smoothing=0.1",
            "--train.mixup=0.2", "--train.ema=0.9",
            "--train.schedule=cosine",
            f"--train.checkpoint_dir={tmp_path}/ck"]
    assert cli.main(["train", *args, "--steps=2"]) == 0

    cfg = config_lib.from_args(args)
    model, _, opt, _, _, _ = cli._build(cfg)
    state, which = cli._restore_best_or_latest(cfg, model, opt)
    assert which is not None
    assert "ema_params" in state
    # and a mismatched template (no --train.ema) still restores
    cfg2 = config_lib.from_args([a for a in args
                                 if not a.startswith("--train.ema")])
    state2, which2 = cli._restore_best_or_latest(cfg2, model, opt)
    assert which2 is not None and "ema_params" in state2
