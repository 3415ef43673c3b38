"""Checkpointing with TP-sharded parameter trees: orbax save from a
model_parallel=2 layout must restore bit-exactly — both into the same
sharded layout and onto a single device (topology change on restore,
the realistic failover path)."""

import numpy as np

import jax
import jax.numpy as jnp

import duoformer_tcga_tpu as dft
from duoformer_tcga_tpu import train as train_lib
from duoformer_tcga_tpu.parallel import mesh as mesh_lib
from duoformer_tcga_tpu.parallel import tp as tp_lib
from duoformer_tcga_tpu.utils.checkpoint import CheckpointManager


def test_tp_sharded_checkpoint_roundtrip(tmp_path):
    model = dft.build_model_no_extra_params(
        num_classes=2, num_layers=2, embed_dim=96, proj_dim=96,
        num_heads=12, depth=2)
    sched = train_lib.onecycle_schedule(1e-3, total_steps=10)
    opt = train_lib.make_optimizer(
        sched, weight_decay=1e-4,
        frozen_label_fn=train_lib.backbone_frozen_labels)
    state = train_lib.init_train_state(model, jax.random.PRNGKey(0), opt)
    ref = jax.tree.map(np.asarray, state["params"])

    mesh = mesh_lib.make_mesh(model_parallel=2, platform="cpu")
    state = dict(state, params=tp_lib.shard_params_tp(mesh, state["params"]))

    ckpt = CheckpointManager(str(tmp_path / "ck"))
    ckpt.save(0, state)
    ckpt.wait()

    # (a) restore into the same TP-sharded template
    restored = ckpt.restore(state)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(
                jax.tree.map(np.asarray, restored["params"]))[0],
            jax.tree_util.tree_flatten_with_path(ref)[0]):
        np.testing.assert_array_equal(a, b,
                                      err_msg=jax.tree_util.keystr(pa))

    # (b) restore onto a single device (different topology than saved)
    single = train_lib.init_train_state(model, jax.random.PRNGKey(1), opt)
    restored1 = ckpt.restore(single)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(
                jax.tree.map(np.asarray, restored1["params"]))[0],
            jax.tree_util.tree_flatten_with_path(ref)[0]):
        np.testing.assert_array_equal(a, b,
                                      err_msg=jax.tree_util.keystr(pa))
    ckpt.close()
