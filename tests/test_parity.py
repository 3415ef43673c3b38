"""Full-model parity: JAX implementation vs torch oracle via the checkpoint
converter. This is the SURVEY §4(b) PyTorch-parity bar (target <=1e-4 max-abs
logit diff, BASELINE.md) exercised end-to-end: oracle state_dict ->
torch_convert -> JAX forward -> compare logits.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from duoformer_tcga_tpu.models.duoformer import DuoFormer, DuoFormerLegacy
from duoformer_tcga_tpu.utils import torch_convert as tc

from torch_oracle import OracleDuoFormer, OracleDuoFormerLegacy


def _run_pair(oracle, model, batch=2, atol=1e-4):
    oracle.eval()
    sd = {k: v for k, v in oracle.state_dict().items()}
    params = tc.to_jax(getattr(tc, model._convert_fn)(sd, model))
    torch.manual_seed(42)
    x = torch.randn(batch, 3, 224, 224)
    with torch.no_grad():
        ref = oracle(x).numpy()
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    out = np.asarray(model.apply(params, xj))
    np.testing.assert_allclose(out, ref, atol=atol, rtol=1e-4)
    return np.max(np.abs(out - ref))


@pytest.mark.parametrize("scale_token", ["random", "channel"])
def test_release_variant_parity(scale_token):
    torch.manual_seed(0)
    oracle = OracleDuoFormer(depth=2, embed_dim=96, num_heads=12,
                             num_classes=3, num_layers=2, proj_dim=96,
                             scale_token=scale_token)
    model = DuoFormer(depth=2, embed_dim=96, num_heads=12, num_classes=3,
                      num_layers=2, proj_dim=96, scale_token=scale_token)
    model._convert_fn = "convert_duoformer"
    _run_pair(oracle, model)


def test_release_variant_4scale_parity():
    torch.manual_seed(1)
    oracle = OracleDuoFormer(depth=2, embed_dim=96, num_heads=8,
                             num_classes=2, num_layers=4, proj_dim=96)
    model = DuoFormer(depth=2, embed_dim=96, num_heads=8, num_classes=2,
                      num_layers=4, proj_dim=96)
    model._convert_fn = "convert_duoformer"
    _run_pair(oracle, model)


def test_release_variant_3scale_parity():
    torch.manual_seed(2)
    oracle = OracleDuoFormer(depth=2, embed_dim=96, num_heads=8,
                             num_classes=2, num_layers=3, proj_dim=96)
    model = DuoFormer(depth=2, embed_dim=96, num_heads=8, num_classes=2,
                      num_layers=3, proj_dim=96)
    model._convert_fn = "convert_duoformer"
    _run_pair(oracle, model)


def test_release_variant_layerscale_parity():
    """init_values path (LayerScale gammas in checkpoint)."""
    torch.manual_seed(3)
    oracle = OracleDuoFormer(depth=2, embed_dim=96, num_heads=12,
                             num_classes=2, num_layers=2, proj_dim=96,
                             init_values=1e-5)
    model = DuoFormer(depth=2, embed_dim=96, num_heads=12, num_classes=2,
                      num_layers=2, proj_dim=96, init_values=1e-5)
    model._convert_fn = "convert_duoformer"
    _run_pair(oracle, model)


def test_legacy_variant_parity():
    """MyModel twin: Q4/Q12/Q13 + derived channel token."""
    torch.manual_seed(4)
    oracle = OracleDuoFormerLegacy(depth=3, embed_dim=96, num_heads=12,
                                   num_classes=4, proj_dim=96)
    model = DuoFormerLegacy(depth=3, embed_dim=96, num_heads=12,
                            num_classes=4, proj_dim=96)
    model._convert_fn = "convert_duoformer_legacy"
    _run_pair(oracle, model)


def test_legacy_squeeze_quirk():
    """Q13: batch size 1 squeezes the batch dim."""
    torch.manual_seed(5)
    oracle = OracleDuoFormerLegacy(depth=2, embed_dim=96, num_heads=12,
                                   num_classes=4, proj_dim=96)
    oracle.eval()
    model = DuoFormerLegacy(depth=2, embed_dim=96, num_heads=12,
                            num_classes=4, proj_dim=96)
    sd = oracle.state_dict()
    params = tc.to_jax(tc.convert_duoformer_legacy(sd, model))
    x = torch.randn(1, 3, 224, 224)
    with torch.no_grad():
        ref = oracle(x)
    out = model.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    assert ref.shape == (4,)        # torch squeezed
    assert out.shape == (4,)        # ours too
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4,
                               rtol=1e-4)


@pytest.mark.slow
def test_full_size_release_parity():
    """Full release config (768/12/12, ResNet-50) — the real parity bar."""
    torch.manual_seed(6)
    oracle = OracleDuoFormer(depth=12, embed_dim=768, num_heads=12,
                             num_classes=2, num_layers=2, proj_dim=768)
    model = DuoFormer(depth=12, embed_dim=768, num_heads=12, num_classes=2,
                      num_layers=2, proj_dim=768)
    model._convert_fn = "convert_duoformer"
    diff = _run_pair(oracle, model, batch=2, atol=1e-4)
    print(f"full-size max logit diff: {diff:.2e}")
