"""End-to-end learning on a learnable synthetic task (color tint).

Three levels (VERDICT r3 missing #1):
  * ResNet50withFC linear probe — the training machinery in isolation
    (loss, frozen-trunk stop_gradient, Adam+schedule, data pipeline);
  * the FULL DuoFormer (both families) through the real `cli train`
    path — warm-started trunk (pretrained in-framework, exported via
    resnet_to_torch_state_dict, re-imported through the
    --train.init_backbone= converter), HDF5 dataset, epoch-end eval,
    best-checkpoint gate — to the reference's own >=0.75 eval-accuracy
    bar (/root/reference/main_toy.py:138). Reduced width/depth (96/2)
    keeps CPU runtime sane; the full-size (768/12) proof runs on real
    silicon in tests/test_tpu_convergence.py and is documented in
    docs/performance.md (round 4): legacy passes at full size as-is;
    the faithful release config's Q7 micro-CLS pathology and the
    apply_fc_norm fix are measured there.

Why the trunk is PRETRAINED (not just BN-calibrated): measured — with
only calibrated BN running stats the tiny release model oscillates at
~0.5 for 175+ steps; with a tint-pretrained trunk it hits eval 1.0
within 50 steps.
"""

import os
import sys

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


@pytest.fixture(scope="module")
def tint_artifacts(tmp_path_factory):
    """Pretrain a trunk on the tint task (unfrozen, batch-stat BN with
    running-stat threading), export it as a torchvision state_dict, and
    materialize tint HDF5 train/eval splits."""
    import torch

    d = tmp_path_factory.mktemp("tint")
    probe = ResNet50withFC(num_classes=2, dtype=jnp.float32)

    class M:
        @staticmethod
        def apply(params, x, rng=None, train=False, bn_stats=None):
            return probe.apply(params, x, rng=rng, train=train,
                               freeze=False, bn_stats=bn_stats)

    opt = train_lib.make_optimizer(train_lib.onecycle_schedule(1e-3, 40))
    state = train_lib.init_train_state(probe, jax.random.PRNGKey(0), opt)
    step = train_lib.make_train_step(M, opt, donate=False, bn_stats=True)
    rng = jax.random.PRNGKey(1)
    for i, raw in zip(range(40),
                      data_lib.synthetic_tiles(8, 2, seed=0,
                                               learnable=True)):
        batch = {"image": data_lib.preprocess_tiles(
            jnp.asarray(raw["image"]), dtype=jnp.float32),
            "label": jnp.asarray(raw["label"])}
        state, m = step(state, batch, rng)
    assert float(m["accuracy"]) == 1.0, "trunk pretraining did not learn"

    from duoformer_tcga_tpu.utils import torch_convert as tc
    trunk = jax.tree.map(lambda a: np.asarray(a, np.float32),
                         jax.device_get(state["params"]["trunk"]))
    trunk_path = str(d / "trunk_tint.torch")
    torch.save(tc.resnet_to_torch_state_dict(trunk, 50), trunk_path)

    train_h5 = data_lib.write_synthetic_hdf5(str(d / "tint_train.h5"),
                                             128, num_classes=2, seed=3)
    eval_h5 = data_lib.write_synthetic_hdf5(str(d / "tint_eval.h5"),
                                            64, num_classes=2, seed=99)
    return {"trunk": trunk_path, "train": train_h5, "eval": eval_h5,
            "dir": str(d)}


def _cli_train_tint(tint_artifacts, capsys, preset, ckdir, steps=125):
    """Run the FULL cli train path on the tint task and return the best
    epoch-end eval accuracy it reports."""
    from duoformer_tcga_tpu import cli

    rc = cli.main([
        "train", f"--preset={preset}", "--model.depth=2",
        "--model.embed_dim=96", "--model.proj_dim=96",
        "--model.dtype=float32", "--train.platform=cpu",
        "--train.batch_size=8",
        f"--train.dataset={tint_artifacts['train']}",
        f"--train.eval_dataset={tint_artifacts['eval']}",
        f"--train.init_backbone={tint_artifacts['trunk']}",
        "--train.steps_per_epoch=25", "--train.epochs=5",
        f"--steps={steps}", "--train.lr=1e-3",
        f"--train.checkpoint_dir={ckdir}",
    ])
    out = capsys.readouterr().out
    assert rc in (0, None), out
    assert "training done (best eval acc" in out, out
    return float(out.rsplit("best eval acc ", 1)[1].split(")")[0])


@pytest.mark.slow
def test_duoformer_release_learns_tint_end_to_end(tint_artifacts, tmp_path,
                                                  capsys):
    """The flagship (release) DuoFormer family, warm-started, trained via
    `cli train` to the reference's >=0.75 eval-accuracy gate."""
    best = _cli_train_tint(tint_artifacts, capsys, "release-2scale",
                           str(tmp_path / "ck_rel"))
    assert best >= 0.75, f"release DuoFormer did not learn: best {best}"


@pytest.mark.slow
def test_duoformer_legacy_learns_tint_end_to_end(tint_artifacts, tmp_path,
                                                 capsys):
    """DuoFormerLegacy at its reference hyperparams (attn_drop 0.1 +
    LayerScale via the legacy-channel preset), same gate."""
    best = _cli_train_tint(tint_artifacts, capsys, "legacy-channel",
                           str(tmp_path / "ck_leg"))
    assert best >= 0.75, f"legacy DuoFormer did not learn: best {best}"
