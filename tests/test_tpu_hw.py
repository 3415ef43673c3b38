"""Real-TPU hardware kernel validation (VERDICT r2 next #4).

These tests compile and execute the Pallas kernels on the actual chip — no
interpret mode — covering shapes that CPU tests can only run interpreted:
the TP-rectangular attention megakernels (Co = C/tp head slices, exactly
what parallel/tp_fused.py emits per shard), their int8 variants, the
hidden-split MLP halves, and the reg (dropout + LayerScale) kernels.

Gated on DUOFORMER_RUN_TPU_TESTS=1 because JAX processes serialize on this
environment's single-chip claim — running them inside the normal CPU suite
would stall it. Run alone:

    DUOFORMER_RUN_TPU_TESTS=1 python -m pytest tests/test_tpu_hw.py -q
"""

import os

import numpy as np
import pytest

run_tpu = os.environ.get("DUOFORMER_RUN_TPU_TESTS") == "1"
pytestmark = [pytest.mark.tpu,
              pytest.mark.skipif(not run_tpu,
                                 reason="set DUOFORMER_RUN_TPU_TESTS=1 "
                                        "(claims the real chip)")]

import jax                                        # noqa: E402
import jax.numpy as jnp                           # noqa: E402

from duoformer_tcga_tpu.ops import pallas_attention as pa  # noqa: E402
from duoformer_tcga_tpu.ops import quantize as qz          # noqa: E402


@pytest.fixture(autouse=True)
def on_tpu(monkeypatch):
    tpus = [d for d in jax.devices() if d.platform == "tpu"]
    if not tpus:
        pytest.skip("no TPU device")
    monkeypatch.setenv("DUOFORMER_PALLAS_INTERPRET", "0")
    prev = jax.config.jax_default_device
    prev_prec = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_device", tpus[0])
    # conftest pins matmul precision "highest" for CPU determinism, but
    # Mosaic rejects the resulting multi-pass bf16 dots on the AOT compile
    # path ("Bad lhs type") — the kernels set f32 accumulation explicitly
    # via preferred_element_type, so "default" loses nothing here
    jax.config.update("jax_default_matmul_precision", "default")
    yield
    jax.config.update("jax_default_device", prev)
    jax.config.update("jax_default_matmul_precision", prev_prec)


def _branch_inputs(key, n_seg=98, S=6, C=768, dtype=jnp.bfloat16):
    ks = jax.random.split(key, 8)
    mk = lambda k, shape, s: (jax.random.normal(k, shape) * s).astype(dtype)
    return dict(
        x=mk(ks[0], (n_seg, S, C), 1.0),
        lns=(jax.random.normal(ks[1], (C,)) * 0.1 + 1.0).astype(dtype),
        lnb=mk(ks[2], (C,), 0.1),
        wqkv=mk(ks[3], (C, 3 * C), 0.05),
        bqkv=mk(ks[4], (3 * C,), 0.05),
        wproj=mk(ks[5], (C, C), 0.05),
        bproj=mk(ks[6], (C,), 0.05),
        gamma=(0.5 + jax.random.uniform(ks[7], (C,))).astype(dtype),
    )


def _head_slice(i, t, tp, C):
    Cl = C // tp
    lo = t * Cl
    wl = jnp.concatenate([i["wqkv"][:, lo:lo + Cl],
                          i["wqkv"][:, C + lo:C + lo + Cl],
                          i["wqkv"][:, 2 * C + lo:2 * C + lo + Cl]], 1)
    bl = jnp.concatenate([i["bqkv"][lo:lo + Cl],
                          i["bqkv"][C + lo:C + lo + Cl],
                          i["bqkv"][2 * C + lo:2 * C + lo + Cl]])
    return wl, bl, i["wproj"][lo:lo + Cl]


@pytest.mark.parametrize("tp", [2, 4])
def test_rectangular_attention_on_hw(tp):
    """Mosaic lowers the Co=C/tp rectangular megakernel shapes on real
    silicon and the head-shard partials sum to the full-width kernel."""
    H, S, C = 12, 6, 768
    i = _branch_inputs(jax.random.PRNGKey(0))
    scale = (C // H) ** -0.5

    @jax.jit
    def full(i):
        return pa.fused_attention_residual(
            i["x"], i["lns"], i["lnb"], i["wqkv"], i["bqkv"], i["wproj"],
            i["bproj"], H, S, scale)

    @jax.jit
    def halves(i):
        acc = jnp.zeros(i["x"].shape, jnp.float32)
        for t in range(tp):
            wl, bl, wp = _head_slice(i, t, tp, C)
            part = pa.fused_attention_residual(
                i["x"], i["lns"], i["lnb"], wl, bl, wp,
                jnp.zeros((C,), i["x"].dtype), H // tp, S, scale, 1e-6,
                True, False)
            acc = acc + part.astype(jnp.float32)
        return (acc + i["bproj"].astype(jnp.float32)
                + i["x"].astype(jnp.float32)).astype(i["x"].dtype)

    a = np.asarray(full(i), np.float32)
    b = np.asarray(halves(i), np.float32)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    np.testing.assert_allclose(a, b, atol=0.08, rtol=0.08)


def test_rectangular_int8_attention_on_hw():
    """The rectangular int8 megakernel (a8w8, Co=C/2) lowers and executes;
    result tracks the bf16 full-width kernel to int8 rounding."""
    H, S, C, tp = 12, 6, 768, 2
    i = _branch_inputs(jax.random.PRNGKey(1))
    scale = (C // H) ** -0.5
    wq_q, sq = qz.quantize_weight(i["wqkv"])
    wp_q, sp = qz.quantize_weight(i["wproj"])

    @jax.jit
    def int8_halves(i, wq_q, sq, wp_q):
        Cl = C // tp
        acc = jnp.zeros(i["x"].shape, jnp.float32)
        for t in range(tp):
            lo = t * Cl
            sl3 = lambda a: jnp.concatenate(
                [a[..., k * C + lo:k * C + lo + Cl] for k in range(3)], -1)
            part = pa.fused_attention_residual_int8(
                i["x"], i["lns"], i["lnb"], sl3(wq_q), sl3(sq),
                sl3(i["bqkv"]), wp_q[lo:lo + Cl], sp,
                jnp.zeros((C,), i["x"].dtype), H // tp, S, scale, 1e-6,
                True, False)
            acc = acc + part.astype(jnp.float32)
        return (acc + i["bproj"].astype(jnp.float32)
                + i["x"].astype(jnp.float32)).astype(i["x"].dtype)

    @jax.jit
    def full_bf16(i):
        return pa.fused_attention_residual(
            i["x"], i["lns"], i["lnb"], i["wqkv"], i["bqkv"], i["wproj"],
            i["bproj"], H, S, scale)

    a = np.asarray(int8_halves(i, wq_q, sq, wp_q), np.float32)
    b = np.asarray(full_bf16(i), np.float32)
    assert np.isfinite(a).all()
    # int8 rounding: compare loosely, plus high cosine similarity
    cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.995


def test_hidden_split_mlp_on_hw():
    C, hid, tp = 768, 3072, 2
    key = jax.random.PRNGKey(2)
    ks = jax.random.split(key, 6)
    dt = jnp.bfloat16
    x = (jax.random.normal(ks[0], (588, C))).astype(dt)
    lns = (jax.random.normal(ks[1], (C,)) * 0.1 + 1.0).astype(dt)
    lnb = (jax.random.normal(ks[2], (C,)) * 0.1).astype(dt)
    w1 = (jax.random.normal(ks[3], (C, hid)) * 0.05).astype(dt)
    b1 = (jax.random.normal(ks[4], (hid,)) * 0.05).astype(dt)
    w2 = (jax.random.normal(ks[5], (hid, C)) * 0.05).astype(dt)
    b2 = jnp.zeros((C,), dt)

    @jax.jit
    def full(x):
        return pa.fused_mlp_residual(x, lns, lnb, w1, b1, w2, b2)

    @jax.jit
    def halves(x):
        hl = hid // tp
        acc = jnp.zeros(x.shape, jnp.float32)
        for t in range(tp):
            part = pa.fused_mlp_residual(
                x, lns, lnb, w1[:, t * hl:(t + 1) * hl],
                b1[t * hl:(t + 1) * hl], w2[t * hl:(t + 1) * hl],
                jnp.zeros((C,), x.dtype), 1e-6, False)
            acc = acc + part.astype(jnp.float32)
        return (acc + b2.astype(jnp.float32)
                + x.astype(jnp.float32)).astype(x.dtype)

    a = np.asarray(full(x), np.float32)
    b = np.asarray(halves(x), np.float32)
    np.testing.assert_allclose(a, b, atol=0.08, rtol=0.08)


@pytest.mark.parametrize("emit_h", [False, True])
def test_mlp_dz_kernel_on_hw(emit_h):
    """The opt-in fused dz kernel (_mlp_dz_kernel: dh GEMM + GELU' + db1
    accumulation, DUOFORMER_MLP_DZ) lowers and executes on real silicon;
    dz/db1/h match the XLA composition to bf16 rounding."""
    C, hid = 768, 3072
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    dt = jnp.bfloat16
    rows = 588
    g2 = (jax.random.normal(ks[0], (rows, C))).astype(dt)
    z = (jax.random.normal(ks[1], (rows, hid))).astype(dt)
    w2 = (jax.random.normal(ks[2], (hid, C)) * 0.05).astype(dt)

    @jax.jit
    def kern(g2, z, w2):
        return pa._mlp_dz_impl(g2, z, w2, emit_h)

    @jax.jit
    def xla(g2, z, w2):
        zf = z.astype(jnp.float32)
        phi = 0.5 * (1.0 + jax.lax.erf(zf * pa._SQRT1_2))
        dh = jax.lax.dot_general(g2, w2.T, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dgelu = phi + zf * (pa._INV_SQRT_2PI * jnp.exp(-0.5 * zf * zf))
        dz = (dh * dgelu).astype(z.dtype)
        return dz, jnp.sum(dz.astype(jnp.float32), axis=0), (zf * phi)

    dz_k, db1_k, h_k = kern(g2, z, w2)
    dz_x, db1_x, h_x = xla(g2, z, w2)
    a = np.asarray(dz_k, np.float32)
    b = np.asarray(dz_x, np.float32)
    assert np.isfinite(a).all()
    np.testing.assert_allclose(a, b, atol=0.08, rtol=0.08)
    db1_a = np.asarray(db1_k, np.float32)
    db1_b = np.asarray(db1_x, np.float32)
    assert np.isfinite(db1_a).all()
    assert float(np.abs(db1_a - db1_b).max()) / \
        max(float(np.abs(db1_b).max()), 1.0) < 0.05
    if emit_h:
        np.testing.assert_allclose(np.asarray(h_k, np.float32),
                                   np.asarray(h_x, np.float32),
                                   atol=0.08, rtol=0.08)


def test_reg_kernels_on_hw():
    """The dropout+LayerScale (reg) kernels — hash-counter RNG and all —
    compile and run on real silicon; forward matches the XLA oracle to
    bf16 rounding and the backward produces finite, oracle-close grads."""
    H, S, C = 12, 6, 768
    i = _branch_inputs(jax.random.PRNGKey(3))
    scale = (C // H) ** -0.5
    seed = jnp.int32(777)

    @jax.jit
    def kfwd(i):
        return pa.fused_attention_residual_reg(
            i["x"], i["lns"], i["lnb"], i["wqkv"], i["bqkv"], i["wproj"],
            i["bproj"], i["gamma"], seed, H, S, scale, 1e-6, True, True,
            0.1, 0.1)

    @jax.jit
    def ofwd(i):
        return pa._fused_block_reg_xla(
            i["x"], i["lns"], i["lnb"], i["wqkv"], i["bqkv"], i["wproj"],
            i["bproj"], i["gamma"], seed, H, S, scale, 1e-6, True, True,
            0.1, 0.1)

    a = np.asarray(kfwd(i), np.float32)
    b = np.asarray(ofwd(i), np.float32)
    assert np.isfinite(a).all()
    np.testing.assert_allclose(a, b, atol=0.08, rtol=0.08)

    def loss_k(x, wqkv, gamma):
        y = pa.fused_attention_residual_reg(
            x, i["lns"], i["lnb"], wqkv, i["bqkv"], i["wproj"], i["bproj"],
            gamma, seed, H, S, scale, 1e-6, True, True, 0.1, 0.1)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_o(x, wqkv, gamma):
        y = pa._fused_block_reg_xla(
            x, i["lns"], i["lnb"], wqkv, i["bqkv"], i["wproj"], i["bproj"],
            gamma, seed, H, S, scale, 1e-6, True, True, 0.1, 0.1)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2)))(i["x"], i["wqkv"],
                                                      i["gamma"])
    go = jax.jit(jax.grad(loss_o, argnums=(0, 1, 2)))(i["x"], i["wqkv"],
                                                      i["gamma"])
    for a, b in zip(gk, go):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        assert np.isfinite(a).all()
        denom = max(float(np.abs(b).max()), 1.0)
        assert float(np.abs(a - b).max()) / denom < 0.08

    @jax.jit
    def kmlp(i):
        w1 = jnp.concatenate([i["wqkv"]] , 1)[:, :3 * C]  # reuse as [C,3C]
        b1 = i["bqkv"]
        w2 = jnp.transpose(w1)[:3 * C]                    # [3C, C]
        return pa.fused_mlp_residual_reg(
            i["x"].reshape(-1, C), i["lns"], i["lnb"], w1, b1, w2,
            i["bproj"], i["gamma"], seed, 1e-6, True, 0.1)

    @jax.jit
    def omlp(i):
        w1 = jnp.concatenate([i["wqkv"]], 1)[:, :3 * C]
        b1 = i["bqkv"]
        w2 = jnp.transpose(w1)[:3 * C]
        return pa._fused_mlp_reg_xla(
            i["x"].reshape(-1, C), i["lns"], i["lnb"], w1, b1, w2,
            i["bproj"], i["gamma"], seed, 1e-6, True, 0.1)

    a = np.asarray(kmlp(i), np.float32)
    b = np.asarray(omlp(i), np.float32)
    assert np.isfinite(a).all()
    np.testing.assert_allclose(a, b, atol=0.1, rtol=0.1)


def test_f32_kernels_compile_on_hw():
    """f32 compute must fit the bf16-tuned kernels' scoped-VMEM budget via
    the dtype-aware tile shrink (_f32_shrink): round 4's faithful-f32
    convergence probe found the save-hidden MLP kernel rejected at 18M
    with the bf16 default tile. Forward + backward of both branches, f32,
    production C/hidden, on the real chip."""
    import numpy as np

    H, S, C = 12, 6, 768
    i = _branch_inputs(jax.random.PRNGKey(7), n_seg=392, dtype=jnp.float32)
    scale = (C // H) ** -0.5
    k2 = jax.random.split(jax.random.PRNGKey(8), 4)
    w1 = (jax.random.normal(k2[0], (C, 4 * C)) * 0.02).astype(jnp.float32)
    b1 = (jax.random.normal(k2[1], (4 * C,)) * 0.02).astype(jnp.float32)
    w2 = (jax.random.normal(k2[2], (4 * C, C)) * 0.02).astype(jnp.float32)
    b2 = (jax.random.normal(k2[3], (C,)) * 0.02).astype(jnp.float32)

    def loss(i, w1, b1, w2, b2):
        y = pa.fused_attention_residual(
            i["x"], i["lns"], i["lnb"], i["wqkv"], i["bqkv"], i["wproj"],
            i["bproj"], H, S, scale)
        z = pa.fused_mlp_residual(y, i["lns"], i["lnb"], w1, b1, w2, b2)
        return jnp.sum(z.astype(jnp.float32) ** 2)

    val, grads = jax.jit(jax.value_and_grad(loss, argnums=(1, 3)))(
        i, w1, b1, w2, b2)
    v = float(np.asarray(val))          # host fetch proves completion
    assert np.isfinite(v) and v > 0
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
