"""Q9 qk-norm parity (SURVEY quirk register; VERDICT r1 Missing #1).

Ground truth from the reference: every attention subclass calls timm-0.9.8
Attention.__init__ POSITIONALLY as (dim, num_heads, qkv_bias, attn_drop,
proj_drop) against the real signature (dim, num_heads, qkv_bias, qk_norm,
attn_drop, proj_drop) — /root/reference/models/multiscale_attn.py:137,
scale_attention.py:25,178. Consequences these tests pin down:

  1. q/k per-head LayerNorms are CREATED (and land in checkpoints) exactly
     when attn_drop_rate > 0. MyModel hardcodes attn_drop_rate=0.1
     (model.py:94) -> every legacy checkpoint has blocks.{i}.attn.q_norm/
     k_norm keys.
  2. They are APPLIED only by AttentionForPatch.forward
     (scale_attention.py:201). forward_with_region (multiscale_attn.py:
     195-219) and AttentionForScale.forward (scale_attention.py:28-45)
     compute qkv manually and never call them.
  3. attn_drop_rate is never an actual dropout rate: the attention-matrix
     dropout gets proj_drop's value and the output-proj dropout gets 0.
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from duoformer_tcga_tpu.models.duoformer import DuoFormer, DuoFormerLegacy
from duoformer_tcga_tpu.utils import torch_convert as tc

from torch_oracle import OracleDuoFormer, OracleDuoFormerLegacy


def test_legacy_qk_norm_keys_converted_not_applied():
    """Randomized q/k-norm weights round-trip through the converter into
    attn2 and leave logits untouched (reference never applies them)."""
    torch.manual_seed(7)
    oracle = OracleDuoFormerLegacy(depth=2, embed_dim=96, num_heads=12,
                                   num_classes=3, proj_dim=96)
    oracle.eval()
    sd = oracle.state_dict()
    # the Q9 keys exist in the checkpoint with non-identity values
    assert "vision_transformer.blocks.0.attn.q_norm.weight" in sd
    assert not torch.allclose(
        sd["vision_transformer.blocks.0.attn.q_norm.weight"],
        torch.ones(96 // 12))

    model = DuoFormerLegacy(depth=2, embed_dim=96, num_heads=12,
                            num_classes=3, proj_dim=96)
    params = tc.to_jax(tc.convert_duoformer_legacy(sd, model))
    # converter consumed the norms into attn2 (not dropped)
    blocks = params["transformer"]["blocks"]
    assert "q_norm" in blocks["attn2"] and "k_norm" in blocks["attn2"]

    torch.manual_seed(8)
    x = torch.randn(2, 3, 224, 224)
    with torch.no_grad():
        ref = oracle(x).numpy()
    out = np.asarray(model.apply(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)

    # perturbing the carried norms must NOT change logits
    blocks2 = dict(blocks)
    attn2 = dict(blocks["attn2"])
    attn2["q_norm"] = {"scale": blocks["attn2"]["q_norm"]["scale"] + 3.0,
                       "bias": blocks["attn2"]["q_norm"]["bias"] - 1.0}
    blocks2["attn2"] = attn2
    params2 = dict(params)
    params2["transformer"] = dict(params["transformer"])
    params2["transformer"]["blocks"] = blocks2
    out2 = np.asarray(model.apply(
        params2, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_array_equal(out, out2)


def test_legacy_init_tree_matches_converted_tree():
    """DuoFormerLegacy.init() (attn_drop_rate=0.1 default -> Q9 norms
    created) produces the same tree structure as a converted checkpoint,
    so orbax restore and jit donation see one layout."""
    model = DuoFormerLegacy(depth=2, embed_dim=96, num_heads=12,
                            num_classes=3, proj_dim=96)
    init_tree = jax.tree_util.tree_structure(model.init(jax.random.PRNGKey(0)))
    oracle = OracleDuoFormerLegacy(depth=2, embed_dim=96, num_heads=12,
                                   num_classes=3, proj_dim=96)
    conv_tree = jax.tree_util.tree_structure(
        tc.to_jax(tc.convert_duoformer_legacy(oracle.state_dict(), model)))
    assert init_tree == conv_tree


def test_release_qk_norm_applied_in_patch_blocks_only():
    """Release family with attn_drop_rate>0: norms created in both stacks,
    applied only by the patch pass — full-model parity vs the oracle that
    implements exactly that asymmetry with randomized norm weights."""
    torch.manual_seed(9)
    oracle = OracleDuoFormer(depth=2, embed_dim=96, num_heads=12,
                             num_classes=3, num_layers=2, proj_dim=96,
                             qk_norm=True)
    oracle.eval()
    model = DuoFormer(depth=2, embed_dim=96, num_heads=12, num_classes=3,
                      num_layers=2, proj_dim=96, attn_drop_rate=0.1)
    assert model.transformer.qk_norm      # Q9 creation rule fired
    sd = oracle.state_dict()
    params = tc.to_jax(tc.convert_duoformer(sd, model))
    sb = params["transformer"]["scale_blocks"]
    pb = params["transformer"]["patch_blocks"]
    assert "q_norm" in sb["attn"] and "q_norm" in pb["attn"]

    torch.manual_seed(10)
    x = torch.randn(2, 3, 224, 224)
    with torch.no_grad():
        ref = oracle(x).numpy()
    out = np.asarray(model.apply(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)

    # patch-block norms are live: perturbing them MUST move the logits
    pb2 = dict(pb)
    attn = dict(pb["attn"])
    attn["q_norm"] = {"scale": pb["attn"]["q_norm"]["scale"] * 2.0,
                      "bias": pb["attn"]["q_norm"]["bias"]}
    pb2["attn"] = attn
    params2 = dict(params)
    params2["transformer"] = dict(params["transformer"])
    params2["transformer"]["patch_blocks"] = pb2
    out_live = np.asarray(model.apply(
        params2, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    assert np.max(np.abs(out_live - out)) > 1e-6

    # scale-block norms are dead weight: perturbing them must NOT
    sb2 = dict(sb)
    attn = dict(sb["attn"])
    attn["q_norm"] = {"scale": sb["attn"]["q_norm"]["scale"] + 5.0,
                      "bias": sb["attn"]["q_norm"]["bias"]}
    sb2["attn"] = attn
    params3 = dict(params)
    params3["transformer"] = dict(params["transformer"])
    params3["transformer"]["scale_blocks"] = sb2
    out_dead = np.asarray(model.apply(
        params3, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_array_equal(out_dead, out)


def test_attn_drop_rate_is_not_a_dropout_rate():
    """Q9 rate shift: attn_drop_rate only toggles qk-norm creation; with
    proj_drop_rate=0 a train-mode forward is dropout-free and matches the
    eval-mode forward exactly, even at attn_drop_rate=0.9."""
    model = DuoFormer(depth=1, embed_dim=96, num_heads=12, num_classes=2,
                      num_layers=2, proj_dim=96, attn_drop_rate=0.9,
                      proj_drop_rate=0.0)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 224, 224, 3))
    out_train = model.apply(params, x, rng=jax.random.PRNGKey(2), train=True)
    out_eval = model.apply(params, x, train=False)
    np.testing.assert_array_equal(np.asarray(out_train), np.asarray(out_eval))
