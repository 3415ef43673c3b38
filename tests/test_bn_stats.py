"""BatchNorm running-stat updates for unfrozen training (VERDICT r1
Missing #3). The reference's model.train() keeps every BN in batch-stat
mode and updates running stats each step (main_toy.py:20; torchvision BN
momentum 0.1). These tests check stat-update parity against torch BN
modules and the end-to-end train-step threading.
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from duoformer_tcga_tpu import train as train_lib
from duoformer_tcga_tpu.models.duoformer import DuoFormer
from duoformer_tcga_tpu.models.resnet import ResNetBackbone
from duoformer_tcga_tpu.utils import torch_convert as tc

from torch_oracle import OracleResNetTrunk


def test_backbone_stat_update_parity_vs_torch():
    """Two train-mode forwards through an r18 trunk: running stats must
    match torch's momentum-0.1 updates, and the batch-stat outputs too."""
    torch.manual_seed(11)
    trunk = OracleResNetTrunk(18)
    trunk.train()
    model = ResNetBackbone(18)
    params = tc.to_jax(tc.convert_resnet(trunk.state_dict(), depth=18))

    for step in range(2):
        torch.manual_seed(20 + step)
        x = torch.randn(4, 3, 64, 64)
        with torch.no_grad():
            ref = trunk(x)                      # updates torch running stats
        stats = {}
        out = model.apply(params, jnp.asarray(
            x.numpy().transpose(0, 2, 3, 1)), train=True, stats=stats)
        params = train_lib.merge_bn_stats(params, stats)
        np.testing.assert_allclose(
            np.asarray(out["3"]),
            ref["3"].numpy().transpose(0, 2, 3, 1), atol=2e-4, rtol=2e-4)

    sd = trunk.state_dict()
    np.testing.assert_allclose(
        np.asarray(params["bn1"]["mean"]), sd["bn1.running_mean"].numpy(),
        atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(params["bn1"]["var"]), sd["bn1.running_var"].numpy(),
        atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(params["layer4"][1]["bn2"]["var"]),
        sd["layer4.1.bn2.running_var"].numpy(), atol=1e-5, rtol=1e-5)


def test_unfrozen_train_step_updates_stats_not_optimizer():
    """make_train_step(bn_stats=True) + bn_stat_frozen_labels: running
    stats move by the batch-stat rule (not Adam), weights train, and a
    frozen-config step leaves stats untouched."""
    model = DuoFormer(depth=1, embed_dim=96, num_heads=12, num_classes=2,
                      num_layers=2, proj_dim=96, freeze_backbone=False,
                      scale_token="channel")
    sched = train_lib.onecycle_schedule(1e-3, total_steps=10)
    opt = train_lib.make_optimizer(
        sched, weight_decay=1e-2,
        frozen_label_fn=train_lib.bn_stat_frozen_labels)
    params = model.init(jax.random.PRNGKey(0))
    state = {"params": params, "opt_state": opt.init(params),
             "step": jnp.zeros((), jnp.int32)}
    batch = {"image": jax.random.normal(jax.random.PRNGKey(1),
                                        (2, 224, 224, 3)) + 0.5,
             "label": jnp.array([0, 1])}
    step = train_lib.make_train_step(model, opt, donate=False, bn_stats=True)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2))

    old_bn = params["backbone"]["bn1"]
    new_bn = new_state["params"]["backbone"]["bn1"]
    # stats moved...
    assert float(jnp.max(jnp.abs(new_bn["mean"] - old_bn["mean"]))) > 1e-6
    # ...by the momentum rule, not by Adam (Adam's first step is ~lr-sized
    # for every trained leaf; verify mean matches the explicit formula)
    xh = batch["image"]
    # torch-style: new = 0.9*old + 0.1*batch_mean of the stem conv output;
    # recompute through the model's own collector for an exact check
    stats = {}
    model.apply(params, batch["image"], train=True, bn_stats=stats)
    np.testing.assert_allclose(np.asarray(new_bn["mean"]),
                               np.asarray(stats["backbone"]["bn1"]["mean"]),
                               atol=1e-6)
    # channel projector fuse BNs update too
    assert "channel_proj" in stats and len(stats["channel_proj"]["fuse"]) == 4
    # weights actually trained
    old_w = params["transformer"]["head"]["w"]
    new_w = new_state["params"]["transformer"]["head"]["w"]
    assert float(jnp.max(jnp.abs(new_w - old_w))) > 0

    # frozen default: stats untouched by a train step
    model_f = DuoFormer(depth=1, embed_dim=96, num_heads=12, num_classes=2,
                        num_layers=2, proj_dim=96, freeze_backbone=True)
    opt_f = train_lib.make_optimizer(
        sched, weight_decay=1e-2,
        frozen_label_fn=train_lib.backbone_frozen_labels)
    params_f = model_f.init(jax.random.PRNGKey(3))
    state_f = {"params": params_f, "opt_state": opt_f.init(params_f),
               "step": jnp.zeros((), jnp.int32)}
    step_f = train_lib.make_train_step(model_f, opt_f, donate=False)
    new_f, _ = step_f(state_f, batch, jax.random.PRNGKey(4))
    np.testing.assert_array_equal(
        np.asarray(new_f["params"]["backbone"]["bn1"]["mean"]),
        np.asarray(params_f["backbone"]["bn1"]["mean"]))
    np.testing.assert_array_equal(
        np.asarray(new_f["params"]["backbone"]["bn1"]["var"]),
        np.asarray(params_f["backbone"]["bn1"]["var"]))


def test_bn_stat_labels_exclude_running_stats():
    """Optimizer labels: mean/var frozen everywhere; weights train; the
    frozen-backbone variant freezes the whole backbone subtree."""
    model = DuoFormer(depth=1, embed_dim=96, num_heads=12, num_classes=2,
                      num_layers=2, proj_dim=96, scale_token="channel")
    params = model.init(jax.random.PRNGKey(0))
    labels = train_lib.bn_stat_frozen_labels(params)
    assert labels["backbone"]["bn1"]["mean"] == "frozen"
    assert labels["backbone"]["bn1"]["var"] == "frozen"
    assert labels["backbone"]["bn1"]["scale"] == "train"
    assert labels["backbone"]["conv1"]["w"] == "train"
    assert labels["channel_proj"]["fuse"][0]["bn"]["mean"] == "frozen"
    assert labels["transformer"]["head"]["w"] == "train"

    labels_f = train_lib.backbone_frozen_labels(params)
    assert labels_f["backbone"]["conv1"]["w"] == "frozen"
    assert labels_f["channel_proj"]["fuse"][0]["bn"]["mean"] == "frozen"
    assert labels_f["channel_proj"]["fuse"][0]["bn"]["scale"] == "train"
