"""int8 (a8w8) MLP serving path: quantization math + bounded logit drift."""

import numpy as np

import jax
import jax.numpy as jnp

from duoformer_tcga_tpu.ops import pallas_attention as pa
from duoformer_tcga_tpu.ops import quantize as q


def test_quantize_weight_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32)) * 0.05
    w_q, s = q.quantize_weight(w)
    assert w_q.dtype == jnp.int8
    recon = w_q.astype(jnp.float32) * s
    # per-channel int8: relative error bounded by ~1/254 of channel range
    np.testing.assert_allclose(np.asarray(recon), np.asarray(w),
                               atol=float(jnp.abs(w).max()) / 120)


def test_int8_mlp_kernel_close_to_f32():
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 8)
    C, H4 = 128, 512
    x = jax.random.normal(ks[0], (37, 6, C)) * 0.5
    lns = jnp.ones((C,))
    lnb = jnp.zeros((C,))
    w1 = jax.random.normal(ks[3], (C, H4)) * 0.02
    b1 = jax.random.normal(ks[4], (H4,)) * 0.01
    w2 = jax.random.normal(ks[5], (H4, C)) * 0.02
    b2 = jax.random.normal(ks[6], (C,)) * 0.01
    ref = pa._fused_mlp_xla(x, lns, lnb, w1, b1, w2, b2, 1e-6)

    w1_q, s1 = q.quantize_weight(w1)
    w2_q, s2 = q.quantize_weight(w2)
    out = pa.fused_mlp_residual_int8(x, lns, lnb, w1_q, s1, b1, w2_q, s2,
                                     b2, 1e-6)
    # a8w8 error budget: ~1% of the residual-branch magnitude
    branch = np.asarray(ref - x)
    err = np.asarray(out - ref)
    assert np.abs(err).max() < 0.05 * (np.abs(branch).max() + 0.1), \
        (np.abs(err).max(), np.abs(branch).max())


def test_predictor_quantized_logits_close(monkeypatch):
    import duoformer_tcga_tpu as dft
    from duoformer_tcga_tpu.inference import Predictor

    monkeypatch.setenv("DUOFORMER_MEGAFUSE", "1")
    monkeypatch.setenv("DUOFORMER_PALLAS_INTERPRET", "1")
    model = dft.build_model_no_extra_params(
        num_classes=4, num_layers=2, embed_dim=128, proj_dim=128,
        num_heads=8, depth=2, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    tiles = np.random.default_rng(0).integers(
        0, 256, (2, 224, 224, 3), dtype=np.uint8)

    ref = np.asarray(Predictor(model, params, dtype=jnp.float32)(tiles))
    out = np.asarray(Predictor(model, params, dtype=jnp.float32,
                               quantize=True)(tiles))
    # int8 MLP drift stays small relative to logit scale
    assert np.abs(out - ref).max() < 0.05 * (np.abs(ref).max() + 1.0)
    assert (out.argmax(-1) == ref.argmax(-1)).all()


def test_quantize_attention_weights_structure():
    import duoformer_tcga_tpu as dft

    model = dft.build_model_no_extra_params(
        num_classes=2, num_layers=2, embed_dim=128, proj_dim=128,
        num_heads=8, depth=2, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    qp = q.quantize_attention_weights(params)
    for stack in ("scale_blocks", "patch_blocks"):
        attn = qp["transformer"][stack]["attn"]
        assert attn["qkv"]["w_q"].dtype == jnp.int8
        assert attn["qkv"]["w_q"].shape == (2, 128, 384)
        assert attn["qkv"]["w_scale"].shape == (2, 384)
        assert attn["proj"]["w_q"].dtype == jnp.int8
        assert "b" in attn["qkv"]
    # untouched elsewhere
    assert "w" in qp["transformer"]["scale_blocks"]["mlp"]["fc1"]


def test_int8_attention_megakernel_drift(monkeypatch):
    """Fused int8 attention branch vs bf16: bounded drift relative to the
    branch magnitude (same bound style as the MLP kernel test)."""
    import numpy as np

    from duoformer_tcga_tpu.ops import pallas_attention as pa

    monkeypatch.setenv("DUOFORMER_PALLAS_INTERPRET", "1")
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 6)
    n_seg, S, C, H = 42, 6, 128, 8
    x = jax.random.normal(ks[0], (n_seg, S, C))
    lns = 1.0 + 0.1 * jax.random.normal(ks[1], (C,))
    lnb = 0.1 * jax.random.normal(ks[2], (C,))
    wqkv = jax.random.normal(ks[3], (C, 3 * C)) * 0.05
    bqkv = jnp.zeros((3 * C,))
    wproj = jax.random.normal(ks[4], (C, C)) * 0.05
    bproj = jnp.zeros((C,))
    scale = (C // H) ** -0.5

    ref = pa.fused_attention_residual(x, lns, lnb, wqkv, bqkv, wproj, bproj,
                                      H, S, scale, 1e-6, True, True)
    qkv_q, s_qkv = q.quantize_weight(wqkv)
    proj_q, s_proj = q.quantize_weight(wproj)
    out = pa.fused_attention_residual_int8(
        x, lns, lnb, qkv_q, s_qkv, bqkv, proj_q, s_proj, bproj,
        H, S, scale, 1e-6, True, True)
    branch = np.asarray(ref - x)
    err = np.asarray(out - ref)
    assert np.abs(err).max() < 0.05 * (np.abs(branch).max() + 0.1), \
        (np.abs(err).max(), np.abs(branch).max())


def test_predictor_int8_tp2_close(monkeypatch):
    """End-to-end int8 serving under tensor parallelism: Predictor with a
    model_parallel=2 mesh + quantize=True stays within the int8 drift
    budget of the bf16 reference and close to single-device int8."""
    import duoformer_tcga_tpu as dft
    from duoformer_tcga_tpu.inference import Predictor
    from duoformer_tcga_tpu.parallel import mesh as mesh_lib

    monkeypatch.setenv("DUOFORMER_MEGAFUSE", "1")
    monkeypatch.setenv("DUOFORMER_PALLAS_INTERPRET", "1")
    model = dft.build_model_no_extra_params(
        num_classes=4, num_layers=2, embed_dim=128, proj_dim=128,
        num_heads=8, depth=2, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    tiles = np.random.default_rng(1).integers(
        0, 256, (8, 224, 224, 3), dtype=np.uint8)

    ref = np.asarray(Predictor(model, params, dtype=jnp.float32)(tiles))
    one = np.asarray(Predictor(model, params, dtype=jnp.float32,
                               quantize=True)(tiles))
    mesh = mesh_lib.make_mesh(model_parallel=2, platform="cpu")
    tp = np.asarray(Predictor(model, params, mesh=mesh, dtype=jnp.float32,
                              quantize=True)(tiles))
    spread = ref.max() - ref.min() + 1e-3
    assert np.abs(tp - one).max() < 0.1 * spread, \
        (np.abs(tp - one).max(), spread)
    assert np.abs(tp - ref).max() < 0.2 * spread, \
        (np.abs(tp - ref).max(), spread)


def test_quantize_rejects_unsupported_families():
    """int8 serving must refuse loudly at quantize time: the int8 kernels
    have no LayerScale epilogue and the XLA fallback cannot read w_q
    trees, so silent acceptance would KeyError mid-forward."""
    import pytest

    import duoformer_tcga_tpu as dft

    # LayerScale release model (init_values via the model class — the
    # factory mirrors the reference signature, which lacks it)
    from duoformer_tcga_tpu.models.duoformer import DuoFormer
    model_ls = DuoFormer(
        num_classes=2, num_layers=2, embed_dim=128, proj_dim=128,
        num_heads=8, depth=1, init_values=1e-5, dtype=jnp.float32)
    params_ls = model_ls.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="LayerScale"):
        q.quantize_mlp_weights(params_ls)
    with pytest.raises(ValueError, match="LayerScale"):
        q.quantize_attention_weights(params_ls)

    # legacy family (MultiscaleTransformer core: "blocks", not
    # "scale_blocks")
    model_leg = dft.build_model(num_classes=2, embed_dim=128, proj_dim=128,
                                num_heads=8, depth=1, pretrained=False,
                                dtype=jnp.float32)
    params_leg = model_leg.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="release"):
        q.quantize_mlp_weights(params_leg)
