"""Multi-slice (DCN) mesh tests on the virtual 8-device CPU mesh.

The reference has no distributed path at all (SURVEY §2: dead
`is_distributed` flag, main_toy.py:63); multi-pod data parallelism is a
new TPU-native capability. The ("dcn", "data", "model") mesh keeps
model-parallel groups inside a slice and crosses DCN only for the
gradient all-reduce — on real hardware XLA decomposes that into
ICI reduce-scatter + DCN all-reduce + ICI all-gather; here we verify
shape handling and numerical exactness of the decomposition on the
virtual mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import duoformer_tcga_tpu as dft
from duoformer_tcga_tpu import train as train_lib
from duoformer_tcga_tpu.parallel import mesh as mesh_lib
from duoformer_tcga_tpu.parallel import tp as tp_lib


def _tiny_model():
    return dft.build_model_no_extra_params(
        num_classes=2, num_layers=2, embed_dim=96, proj_dim=96,
        num_heads=12, depth=2)


def test_multislice_mesh_shapes():
    m = mesh_lib.make_mesh(platform="cpu", dcn_slices=2)
    assert m.axis_names == ("dcn", "data", "model")
    assert m.shape["dcn"] == 2 and m.shape["data"] == 4
    assert m.shape["model"] == 1

    m2 = mesh_lib.make_mesh(platform="cpu", dcn_slices=2, model_parallel=2)
    assert m2.shape == {"dcn": 2, "data": 2, "model": 2}

    with pytest.raises(ValueError):
        mesh_lib.make_mesh(platform="cpu", dcn_slices=3)


def test_multislice_batch_sharding_axes():
    m = mesh_lib.make_mesh(platform="cpu", dcn_slices=2)
    assert mesh_lib.batch_axes(m) == ("dcn", "data")
    x = jnp.zeros((8, 4))
    xs = mesh_lib.shard_batch(m, x)
    # batch dim split over dcn*data = 8 ways
    assert xs.sharding.shard_shape(x.shape) == (1, 4)


def test_multislice_forward_matches_single_device():
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 224, 224, 3))
    ref = jax.jit(lambda p, x: model.apply(p, x))(params, x)

    mesh = mesh_lib.make_mesh(platform="cpu", dcn_slices=2)
    ps = mesh_lib.replicate(mesh, params)
    xs = mesh_lib.shard_batch(mesh, x)
    out = jax.jit(lambda p, x: model.apply(p, x),
                  out_shardings=mesh_lib.batch_sharding(mesh))(ps, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_multislice_train_step_matches_flat_dp():
    """One train step on the (dcn=2, data=4) mesh must produce the same
    updated params as flat dp=8 — the hierarchical gradient all-reduce is
    numerically the same sum."""
    model = _tiny_model()
    sched = train_lib.onecycle_schedule(1e-3, total_steps=10)
    opt = train_lib.make_optimizer(
        sched, weight_decay=1e-4,
        frozen_label_fn=train_lib.backbone_frozen_labels)
    state0 = train_lib.init_train_state(model, jax.random.PRNGKey(0), opt)
    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(1), (16, 224, 224, 3)),
        "label": jnp.array([0, 1] * 8, jnp.int32),
    }
    rng = jax.random.PRNGKey(2)

    results = []
    for dcn in (1, 2):
        mesh = mesh_lib.make_mesh(platform="cpu", dcn_slices=dcn)
        st = mesh_lib.replicate(mesh, state0)
        bt = mesh_lib.shard_batch(mesh, batch)
        rt = mesh_lib.replicate(mesh, rng)
        step = train_lib.make_train_step(model, opt, mesh=mesh, donate=False)
        st2, metrics = step(st, bt, rt)
        results.append((jax.tree.map(np.asarray, st2["params"]),
                        float(metrics["loss"])))

    (p_flat, l_flat), (p_ms, l_ms) = results
    assert np.isfinite(l_flat) and abs(l_flat - l_ms) < 1e-6
    flat_a, _ = jax.tree_util.tree_flatten_with_path(p_flat)
    flat_b, _ = jax.tree_util.tree_flatten_with_path(p_ms)
    for (path, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            a, b, atol=1e-6, rtol=1e-6,
            err_msg=jax.tree_util.keystr(path))


def test_multislice_with_tp_forward_exact():
    """dcn=2 x dp=2 x tp=2: TP param sharding + multislice batch split,
    forward exact vs single device (XLA path; the SPMD partitioner
    handles the TP layout)."""
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 224, 224, 3))
    ref = jax.jit(lambda p, x: model.apply(p, x))(params, x)

    mesh = mesh_lib.make_mesh(platform="cpu", dcn_slices=2, model_parallel=2)
    ps = tp_lib.shard_params_tp(mesh, params)
    xs = mesh_lib.shard_batch(mesh, x)
    out = jax.jit(lambda p, x: model.apply(p, x),
                  out_shardings=mesh_lib.batch_sharding(mesh))(ps, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
