"""Fused Pallas kernels under tensor parallelism via shard_map
(parallel/tp_fused.py) — VERDICT r1 item #5: model_parallel>1 keeps the
fused path with DUOFORMER_FUSED_ATTN=1 instead of dropping to XLA.

Kernels run in interpret mode on the virtual 8-device CPU mesh
(conftest.py); f32 inputs, so parity bars are float-rounding level.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import duoformer_tcga_tpu as dft
from duoformer_tcga_tpu.ops import attention as attn_ops
from duoformer_tcga_tpu.ops import pallas_attention as pa
from duoformer_tcga_tpu.parallel import mesh as mesh_lib
from duoformer_tcga_tpu.parallel import tp as tp_lib
from duoformer_tcga_tpu.parallel import tp_fused


def _branch_inputs(key, n_seg=8, S=6, C=96):
    ks = jax.random.split(key, 8)
    return dict(
        x=jax.random.normal(ks[0], (n_seg, S, C), jnp.float32),
        lns=jax.random.normal(ks[1], (C,)) * 0.1 + 1.0,
        lnb=jax.random.normal(ks[2], (C,)) * 0.1,
        wqkv=jax.random.normal(ks[3], (C, 3 * C)) * 0.05,
        bqkv=jax.random.normal(ks[4], (3 * C,)) * 0.05,
        wproj=jax.random.normal(ks[5], (C, C)) * 0.05,
        bproj=jax.random.normal(ks[6], (C,)) * 0.05,
    )


def test_rectangular_kernel_halves_sum_to_full():
    """The megakernel on each head-half (wqkv [C, 3C/2], wproj [C/2, C])
    sums to the square-kernel/XLA result — the TP decomposition identity."""
    H, S, C = 12, 6, 96
    i = _branch_inputs(jax.random.PRNGKey(0), S=S, C=C)
    scale = (C // H) ** -0.5
    ref = pa._fused_block_xla(i["x"], i["lns"], i["lnb"], i["wqkv"],
                              i["bqkv"], i["wproj"], i["bproj"],
                              H, S, scale, 1e-6)
    Cl = C // 2
    acc = 0.0
    for t in range(2):
        lo = t * Cl
        wl = jnp.concatenate([i["wqkv"][:, lo:lo + Cl],
                              i["wqkv"][:, C + lo:C + lo + Cl],
                              i["wqkv"][:, 2 * C + lo:2 * C + lo + Cl]], 1)
        bl = jnp.concatenate([i["bqkv"][lo:lo + Cl],
                              i["bqkv"][C + lo:C + lo + Cl],
                              i["bqkv"][2 * C + lo:2 * C + lo + Cl]])
        acc = acc + pa.fused_attention_residual(
            i["x"], i["lns"], i["lnb"], wl, bl, i["wproj"][lo:lo + Cl],
            jnp.zeros((C,)), H // 2, S, scale, 1e-6, True, False)
    out = acc + i["bproj"] + i["x"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_tp_attention_branch_matches_reference():
    H, S, C = 12, 6, 96
    i = _branch_inputs(jax.random.PRNGKey(1), S=S, C=C)
    scale = (C // H) ** -0.5
    ref = pa._fused_block_xla(i["x"], i["lns"], i["lnb"], i["wqkv"],
                              i["bqkv"], i["wproj"], i["bproj"],
                              H, S, scale, 1e-6)
    mesh = mesh_lib.make_mesh(model_parallel=2, platform="cpu")
    out = jax.jit(lambda *a: tp_fused.attention_branch_tp(
        mesh, *a, num_heads=H, seg_len=S, scale=scale))(
        i["x"], i["lns"], i["lnb"], i["wqkv"], i["bqkv"], i["wproj"],
        i["bproj"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_tp_attention_branch_grads_match_reference():
    H, S, C = 12, 6, 96
    i = _branch_inputs(jax.random.PRNGKey(2), S=S, C=C)
    scale = (C // H) ** -0.5
    mesh = mesh_lib.make_mesh(model_parallel=2, platform="cpu")

    def loss_tp(wqkv, wproj):
        return jnp.sum(tp_fused.attention_branch_tp(
            mesh, i["x"], i["lns"], i["lnb"], wqkv, i["bqkv"], wproj,
            i["bproj"], num_heads=H, seg_len=S, scale=scale) ** 2)

    def loss_ref(wqkv, wproj):
        return jnp.sum(pa._fused_block_xla(
            i["x"], i["lns"], i["lnb"], wqkv, i["bqkv"], wproj, i["bproj"],
            H, S, scale, 1e-6) ** 2)

    g_tp = jax.jit(jax.grad(loss_tp, argnums=(0, 1)))(i["wqkv"], i["wproj"])
    g_rf = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(i["wqkv"], i["wproj"])
    for a, b in zip(g_tp, g_rf):
        scale_ref = float(jnp.max(jnp.abs(b)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6 * max(scale_ref, 1.0))


def test_tp_mlp_branch_matches_reference():
    C = 96
    i = _branch_inputs(jax.random.PRNGKey(3), C=C)
    ks = jax.random.split(jax.random.PRNGKey(4), 2)
    w1 = jax.random.normal(ks[0], (C, 4 * C)) * 0.05
    w2 = jax.random.normal(ks[1], (4 * C, C)) * 0.05
    b1 = jnp.full((4 * C,), 0.01)
    b2 = jnp.full((C,), 0.01)
    x2 = i["x"].reshape(-1, C)
    ref = pa._fused_mlp_xla(x2, i["lns"], i["lnb"], w1, b1, w2, b2, 1e-6)
    mesh = mesh_lib.make_mesh(model_parallel=2, platform="cpu")
    out = jax.jit(lambda *a: tp_fused.mlp_branch_tp(mesh, *a))(
        x2, i["lns"], i["lnb"], w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_model_forward_tp2_fused_matches_xla(monkeypatch):
    """Full tiny model, tp=2, DUOFORMER_FUSED_ATTN=1: the shard_map fused
    path must match the single-device XLA path (f32: observed exact)."""
    monkeypatch.setenv("DUOFORMER_FUSED_ATTN", "1")
    model = dft.build_model_no_extra_params(
        num_classes=2, num_layers=2, embed_dim=96, proj_dim=96,
        num_heads=12, depth=2)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 224, 224, 3))

    with attn_ops.force_xla_path():
        ref = jax.jit(lambda p, x: model.apply(p, x))(params, x)

    mesh = mesh_lib.make_mesh(model_parallel=2, platform="cpu")
    ps = tp_lib.shard_params_tp(mesh, params)
    xs = mesh_lib.shard_batch(mesh, x)
    with attn_ops.tp_fused_path(mesh):
        out = jax.jit(lambda p, x: model.apply(p, x),
                      out_shardings=mesh_lib.batch_sharding(mesh))(ps, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.slow
def test_train_step_tp2_fused(monkeypatch):
    """One full train step under tp=2 with the fused path: finite loss,
    trainable params move (interpret-mode backward — slow suite)."""
    from duoformer_tcga_tpu import train as train_lib
    monkeypatch.setenv("DUOFORMER_FUSED_ATTN", "1")
    model = dft.build_model_no_extra_params(
        num_classes=2, num_layers=2, embed_dim=96, proj_dim=96,
        num_heads=12, depth=2)
    mesh = mesh_lib.make_mesh(model_parallel=2, platform="cpu")
    sched = train_lib.onecycle_schedule(1e-3, total_steps=10)
    opt = train_lib.make_optimizer(
        sched, weight_decay=1e-4,
        frozen_label_fn=train_lib.backbone_frozen_labels)
    params = tp_lib.shard_params_tp(mesh, model.init(jax.random.PRNGKey(0)))
    state = {"params": params, "opt_state": jax.jit(opt.init)(params),
             "step": mesh_lib.replicate(mesh, jnp.zeros((), jnp.int32))}
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 224, 224, 3))
    batch = mesh_lib.shard_batch(
        mesh, {"image": x, "label": jnp.array([0, 1] * 4, jnp.int32)})
    rng = mesh_lib.replicate(mesh, jax.random.PRNGKey(2))
    step = train_lib.make_train_step(model, opt, mesh=None, donate=False)
    state2, metrics = step(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2["step"]) == 1


def test_tp_int8_attention_branch_close(monkeypatch):
    """int8 attention branch under tp=2 vs single-device int8: identical
    qkv stage (same row/column scales), proj activation row-quant spans
    only the shard's Co columns -> rounding-level drift, bounded."""
    from duoformer_tcga_tpu.ops import quantize as q

    H, S, C = 12, 6, 96
    i = _branch_inputs(jax.random.PRNGKey(5), S=S, C=C)
    scale = (C // H) ** -0.5
    wqkv_q, sqkv = q.quantize_weight(i["wqkv"])
    wproj_q, sproj = q.quantize_weight(i["wproj"])

    ref_f32 = pa._fused_block_xla(i["x"], i["lns"], i["lnb"], i["wqkv"],
                                  i["bqkv"], i["wproj"], i["bproj"],
                                  H, S, scale, 1e-6)
    one = pa.fused_attention_residual_int8(
        i["x"], i["lns"], i["lnb"], wqkv_q, sqkv, i["bqkv"], wproj_q,
        sproj, i["bproj"], H, S, scale, 1e-6)
    mesh = mesh_lib.make_mesh(model_parallel=2, platform="cpu")
    out = jax.jit(lambda *a: tp_fused.attention_branch_tp_int8(
        mesh, *a, num_heads=H, seg_len=S, scale=scale))(
        i["x"], i["lns"], i["lnb"], wqkv_q, sqkv, i["bqkv"], wproj_q,
        sproj, i["bproj"])
    branch = np.abs(np.asarray(ref_f32) - np.asarray(i["x"])).max()
    # tp-vs-single int8 differ only in proj act quantization granularity
    assert np.abs(np.asarray(out) - np.asarray(one)).max() \
        < 0.05 * (branch + 0.1)
    # and both stay within the int8 drift budget of the f32 reference
    assert np.abs(np.asarray(out) - np.asarray(ref_f32)).max() \
        < 0.08 * (branch + 0.1)


def test_tp_int8_mlp_branch_close(monkeypatch):
    from duoformer_tcga_tpu.ops import quantize as q

    C = 96
    i = _branch_inputs(jax.random.PRNGKey(6), C=C)
    ks = jax.random.split(jax.random.PRNGKey(7), 2)
    w1 = jax.random.normal(ks[0], (C, 4 * C)) * 0.05
    w2 = jax.random.normal(ks[1], (4 * C, C)) * 0.05
    b1 = jnp.full((4 * C,), 0.01)
    b2 = jnp.full((C,), 0.01)
    w1_q, s1 = q.quantize_weight(w1)
    w2_q, s2 = q.quantize_weight(w2)
    x2 = i["x"].reshape(-1, C)

    ref_f32 = pa._fused_mlp_xla(x2, i["lns"], i["lnb"], w1, b1, w2, b2,
                                1e-6)
    one = pa.fused_mlp_residual_int8(x2, i["lns"], i["lnb"], w1_q, s1, b1,
                                     w2_q, s2, b2, 1e-6)
    mesh = mesh_lib.make_mesh(model_parallel=2, platform="cpu")
    out = jax.jit(lambda *a: tp_fused.mlp_branch_tp_int8(mesh, *a))(
        x2, i["lns"], i["lnb"], w1_q, s1, b1, w2_q, s2, b2)
    branch = np.abs(np.asarray(ref_f32) - np.asarray(x2)).max()
    assert np.abs(np.asarray(out) - np.asarray(one)).max() \
        < 0.05 * (branch + 0.1)
    assert np.abs(np.asarray(out) - np.asarray(ref_f32)).max() \
        < 0.08 * (branch + 0.1)


def test_model_forward_tp2_int8_close(monkeypatch):
    """Full tiny model with every transformer GEMM int8 under tp=2: logits
    close to the bf16/f32 XLA path (int8 drift budget), argmax agreement."""
    from duoformer_tcga_tpu.ops import quantize as q

    monkeypatch.setenv("DUOFORMER_FUSED_ATTN", "1")
    monkeypatch.setenv("DUOFORMER_MEGAFUSE", "1")
    model = dft.build_model_no_extra_params(
        num_classes=4, num_layers=2, embed_dim=128, proj_dim=128,
        num_heads=8, depth=2)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 224, 224, 3))

    with attn_ops.force_xla_path():
        ref = jax.jit(lambda p, x: model.apply(p, x))(params, x)

    qparams = q.quantize_attention_weights(q.quantize_mlp_weights(params))
    mesh = mesh_lib.make_mesh(model_parallel=2, platform="cpu")
    ps = tp_lib.shard_params_tp(mesh, qparams)
    xs = mesh_lib.shard_batch(mesh, x)
    with attn_ops.tp_fused_path(mesh):
        out = jax.jit(lambda p, x: model.apply(p, x),
                      out_shardings=mesh_lib.batch_sharding(mesh))(ps, xs)
    ref_n, out_n = np.asarray(ref), np.asarray(out)
    spread = ref_n.max() - ref_n.min() + 1e-3
    assert np.abs(out_n - ref_n).max() < 0.15 * spread, \
        (np.abs(out_n - ref_n).max(), spread)
    assert (out_n.argmax(-1) == ref_n.argmax(-1)).mean() >= 0.9
