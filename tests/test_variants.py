"""Variant-matrix edges: patch_attn=False, scaleformer family, presets."""

import numpy as np
import jax
import jax.numpy as jnp

import duoformer_tcga_tpu as dft
from duoformer_tcga_tpu import config as config_lib


def test_patch_attn_false_path():
    """patch_attn=False classifies from mean-pooled region tokens
    (extension; the reference accepts but cannot apply the flag)."""
    m = dft.build_model_no_extra_params(
        num_classes=3, num_layers=2, embed_dim=96, proj_dim=96,
        num_heads=12, depth=1, patch_attn=False, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0))
    # no patch blocks needed for the forward, but params still include them
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 224, 224, 3))
    out = jax.jit(lambda p, v: m.apply(p, v))(params, x)
    assert out.shape == (2, 3)


def test_every_preset_builds():
    for name, mc in config_lib.PRESETS.items():
        model = mc.build()
        assert model is not None, name


def test_scaleformer_family_apply():
    cfg = config_lib.PRESETS["scaleformer-only"]
    import dataclasses
    mc = dataclasses.replace(cfg, depth=1, embed_dim=96, num_heads=12,
                             dtype="float32")
    sf = mc.build()
    params = sf.init(jax.random.PRNGKey(0))
    tokens = jax.random.normal(jax.random.PRNGKey(1), (2, 49, 5, 96))
    out = sf.apply(params, tokens)
    assert out.shape == (2, 49, 96)


def test_qk_norm_path_parity():
    """qk-norm-enabled attention (the Q9-adjacent timm hook): params
    convert and apply with logit parity vs a torch oracle."""
    import numpy as np
    import torch

    from duoformer_tcga_tpu.ops import attention as attn_ops

    torch.manual_seed(31)
    C, H, S = 96, 8, 6
    D = C // H
    qkv = torch.nn.Linear(C, 3 * C)
    proj = torch.nn.Linear(C, C)
    qn = torch.nn.LayerNorm(D, eps=1e-6)
    kn = torch.nn.LayerNorm(D, eps=1e-6)
    with torch.no_grad():
        qn.weight.normal_(1.0, 0.1)
        kn.bias.normal_(0.0, 0.1)
    x = torch.randn(2, 10, S, C)

    def torch_fwd(x):
        lead = x.shape[:-2]
        h = qkv(x).reshape(*lead, S, 3, H, D)
        h = torch.movedim(h, -3, 0)
        h = torch.movedim(h, -2, -3)
        q, k, v = qn(h[0]), kn(h[1]), h[2]
        a = ((q @ k.transpose(-2, -1)) * D ** -0.5).softmax(dim=-1)
        o = torch.movedim(a @ v, -3, -2).reshape(*lead, S, C)
        return proj(o)

    with torch.no_grad():
        ref = torch_fwd(x).numpy()

    params = {
        "qkv": {"w": jnp.asarray(qkv.weight.detach().numpy().T),
                "b": jnp.asarray(qkv.bias.detach().numpy())},
        "proj": {"w": jnp.asarray(proj.weight.detach().numpy().T),
                 "b": jnp.asarray(proj.bias.detach().numpy())},
        "q_norm": {"scale": jnp.asarray(qn.weight.detach().numpy()),
                   "bias": jnp.asarray(qn.bias.detach().numpy())},
        "k_norm": {"scale": jnp.asarray(kn.weight.detach().numpy()),
                   "bias": jnp.asarray(kn.bias.detach().numpy())},
    }
    out = attn_ops.multihead_attention(
        params, jnp.asarray(x.numpy()), H)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


def test_drop_path_active_training():
    """drop_path_rate > 0 (stochastic depth, dpr linspace): train-mode
    forward differs run-to-run structure-free, eval-mode ignores it."""
    import numpy as np
    from duoformer_tcga_tpu.models.transformer import MultiscaleTransformer

    tf = MultiscaleTransformer(depth=2, scales=2, num_heads=8, embed_dim=64,
                               num_classes=3, drop_path_rate=0.8,
                               init_values=None, dtype=jnp.float32)
    params = tf.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 49, 6, 64))

    e1 = tf.apply(params, x, train=False)
    e2 = tf.apply(params, x, train=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))

    t1 = tf.apply(params, x, rng=jax.random.PRNGKey(2), train=True)
    t2 = tf.apply(params, x, rng=jax.random.PRNGKey(3), train=True)
    assert np.abs(np.asarray(t1) - np.asarray(t2)).max() > 0
    assert np.isfinite(np.asarray(t1)).all()


def test_apply_fc_norm_q7_fix_optin():
    """Default = bit-faithful Q7 (fc_norm computed and discarded, head on
    raw CLS). apply_fc_norm=True applies the LayerNorm the reference
    created — same params, logits = head(LN(cls)). The fix is what makes
    FROM-SCRATCH full-size training feasible (docs/performance.md r4)."""
    from duoformer_tcga_tpu.ops import nn

    kw = dict(num_classes=2, num_layers=2, embed_dim=96, proj_dim=96,
              num_heads=12, depth=1, dtype=jnp.float32)
    m0 = dft.build_model_no_extra_params(**kw)
    m1 = dft.build_model_no_extra_params(apply_fc_norm=True, **kw)
    params = m0.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 224, 224, 3))
    l0, cls = m0.apply(params, x, with_embedding=True)
    l1 = m1.apply(params, x)
    assert float(np.abs(np.asarray(l0 - l1)).max()) > 0
    want = nn.linear(params["transformer"]["head"],
                     nn.layernorm(params["transformer"]["fc_norm"],
                                  cls, 1e-6))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(want),
                               atol=1e-6, rtol=1e-6)
    # config plumbing
    from duoformer_tcga_tpu import config as config_lib
    cfg = config_lib.from_args(
        ["--preset=release-2scale", "--model.apply_fc_norm=true",
         "--model.depth=1", "--model.embed_dim=96", "--model.proj_dim=96"])
    assert cfg.model.build().transformer.apply_fc_norm
