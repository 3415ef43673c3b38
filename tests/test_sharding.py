"""Multi-chip sharding tests on the 8-device virtual CPU mesh (conftest.py
sets XLA_FLAGS=--xla_force_host_platform_device_count=8)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import duoformer_tcga_tpu as dft
from duoformer_tcga_tpu import train as train_lib
from duoformer_tcga_tpu.parallel import mesh as mesh_lib


def _tiny_model():
    return dft.build_model_no_extra_params(
        num_classes=2, num_layers=2, embed_dim=96, proj_dim=96,
        num_heads=12, depth=2)


def test_mesh_shape():
    mesh = mesh_lib.make_mesh(platform="cpu")
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model")
    mesh2 = mesh_lib.make_mesh(model_parallel=2, platform="cpu")
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2


def test_mesh_refuses_to_shrink():
    with pytest.raises(ValueError):
        mesh_lib.make_mesh(n_devices=64, platform="cpu")


def test_sharded_forward_matches_single_device():
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 224, 224, 3))

    ref = jax.jit(lambda p, x: model.apply(p, x))(params, x)

    mesh = mesh_lib.make_mesh(platform="cpu")
    ps = mesh_lib.replicate(mesh, params)
    xs = mesh_lib.shard_batch(mesh, x)
    out = jax.jit(lambda p, x: model.apply(p, x),
                  out_shardings=mesh_lib.batch_sharding(mesh))(ps, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_train_step_runs_and_descends():
    """One DP train step on the mesh: loss finite, frozen backbone params
    unchanged, trainable params changed."""
    model = _tiny_model()
    mesh = mesh_lib.make_mesh(platform="cpu")
    sched = train_lib.onecycle_schedule(1e-3, total_steps=10)
    opt = train_lib.make_optimizer(
        sched, weight_decay=1e-4,
        frozen_label_fn=train_lib.backbone_frozen_labels)
    state = train_lib.init_train_state(model, jax.random.PRNGKey(0), opt)
    p0 = jax.tree.map(lambda x: np.asarray(x), state["params"])
    state = mesh_lib.replicate(mesh, state)

    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(1), (16, 224, 224, 3)),
        "label": jnp.array([0, 1] * 8, jnp.int32),
    }
    batch = mesh_lib.shard_batch(mesh, batch)
    rng = mesh_lib.replicate(mesh, jax.random.PRNGKey(2))

    step = train_lib.make_train_step(model, opt, mesh=mesh, donate=False)
    state2, metrics = step(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2["step"]) == 1

    # frozen backbone untouched (incl. no weight-decay leak)
    b0 = jax.tree.leaves(p0["backbone"])
    b1 = jax.tree.leaves(jax.tree.map(np.asarray, state2["params"]["backbone"]))
    for a, b in zip(b0, b1):
        np.testing.assert_array_equal(a, b)

    # transformer head did move
    h0 = np.asarray(p0["transformer"]["head"]["w"])
    h1 = np.asarray(state2["params"]["transformer"]["head"]["w"])
    assert np.abs(h0 - h1).max() > 0


def test_tp_forward_matches_replicated():
    """Megatron-style TP over the model axis: same logits as replicated."""
    from duoformer_tcga_tpu.parallel import tp as tp_lib

    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 224, 224, 3))
    ref = jax.jit(lambda p, v: model.apply(p, v))(params, x)

    mesh = mesh_lib.make_mesh(model_parallel=2, platform="cpu")
    tp_params = tp_lib.shard_params_tp(mesh, params)
    # qkv weights really are sharded over the model axis
    qkv_sh = tp_params["transformer"]["scale_blocks"]["attn"]["qkv"]["w"].sharding
    assert qkv_sh.spec == jax.sharding.PartitionSpec(None, None, "model")
    xs = mesh_lib.shard_batch(mesh, x)
    out = jax.jit(lambda p, v: model.apply(p, v))(tp_params, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_tp_train_step_exact_with_fused_attn_requested(monkeypatch):
    """model_parallel>1 with the fused path DISABLED (DUOFORMER_FUSED_ATTN=0)
    must warn at trace time, take the XLA path, and stay EXACT vs the
    single-device step. (With =1 the step now runs the shard_map fused
    path instead — covered by tests/test_tp_fused.py.)"""
    import warnings as _warnings

    from duoformer_tcga_tpu.parallel import tp as tp_lib

    monkeypatch.setenv("DUOFORMER_FUSED_ATTN", "1")
    monkeypatch.setenv("DUOFORMER_MEGAFUSE", "1")

    model = _tiny_model()
    sched = train_lib.onecycle_schedule(1e-3, total_steps=10)
    opt = train_lib.make_optimizer(
        sched, weight_decay=1e-4,
        frozen_label_fn=train_lib.backbone_frozen_labels)
    state = train_lib.init_train_state(model, jax.random.PRNGKey(0), opt)
    batch_host = {
        "image": jax.random.normal(jax.random.PRNGKey(1), (8, 224, 224, 3)),
        "label": jnp.array([0, 1] * 4, jnp.int32),
    }
    rng = jax.random.PRNGKey(2)

    # single-device reference with the XLA path
    monkeypatch.setenv("DUOFORMER_FUSED_ATTN", "0")
    monkeypatch.setenv("DUOFORMER_MEGAFUSE", "0")
    ref_step = train_lib.make_train_step(model, opt, donate=False)
    ref_state, ref_metrics = ref_step(state, batch_host, rng)

    monkeypatch.setenv("DUOFORMER_FUSED_ATTN", "1")
    monkeypatch.setenv("DUOFORMER_MEGAFUSE", "1")
    mesh = mesh_lib.make_mesh(model_parallel=2, platform="cpu")
    tp_state = {
        "params": tp_lib.shard_params_tp(mesh, state["params"]),
        "opt_state": mesh_lib.replicate(mesh, state["opt_state"]),
        "step": mesh_lib.replicate(mesh, state["step"]),
    }
    batch = mesh_lib.shard_batch(mesh, batch_host)
    # fused disabled: the TP step must warn (at trace time), force the
    # XLA path, and stay exact
    monkeypatch.setenv("DUOFORMER_FUSED_ATTN", "0")
    monkeypatch.setenv("DUOFORMER_MEGAFUSE", "0")
    step = train_lib.make_train_step(model, opt, mesh=mesh, donate=False)
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        tp_state2, tp_metrics = step(tp_state, batch,
                                     mesh_lib.replicate(mesh, rng))
    assert any("model_parallel" in str(w.message) for w in rec)
    np.testing.assert_allclose(float(tp_metrics["loss"]),
                               float(ref_metrics["loss"]), atol=1e-5)
    h_ref = np.asarray(ref_state["params"]["transformer"]["head"]["w"])
    h_tp = np.asarray(tp_state2["params"]["transformer"]["head"]["w"])
    np.testing.assert_allclose(h_tp, h_ref, atol=1e-5)


def test_eval_step_metrics():
    model = _tiny_model()
    mesh = mesh_lib.make_mesh(platform="cpu")
    params = mesh_lib.replicate(mesh, model.init(jax.random.PRNGKey(0)))
    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(1), (8, 224, 224, 3)),
        "label": jnp.zeros((8,), jnp.int32),
    }
    batch = mesh_lib.shard_batch(mesh, batch)
    ev = train_lib.make_eval_step(model, mesh=mesh)
    m = ev(params, batch)
    assert 0.0 <= float(m["accuracy"]) <= 1.0
    assert int(m["correct"]) == round(float(m["accuracy"]) * 8)


def test_sharded_batch_through_megakernels(monkeypatch):
    """Batch-sharded forward through the Pallas megakernels (interpret)
    must equal the single-device result exactly."""
    monkeypatch.setenv("DUOFORMER_FUSED_ATTN", "1")
    monkeypatch.setenv("DUOFORMER_MEGAFUSE", "1")
    model = dft.build_model_no_extra_params(
        num_classes=2, num_layers=2, embed_dim=128, proj_dim=128,
        num_heads=8, depth=1, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 224, 224, 3))
    ref = jax.jit(lambda p, v: model.apply(p, v))(params, x)

    mesh = mesh_lib.make_mesh(platform="cpu")
    out = jax.jit(lambda p, v: model.apply(p, v),
                  out_shardings=mesh_lib.replicated(mesh))(
        mesh_lib.replicate(mesh, params), mesh_lib.shard_batch(mesh, x))
    # partitioning may reorder f32 reductions; numerics must still agree
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
