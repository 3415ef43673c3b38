"""Checkpoint-layout coverage: the reference produces TWO trunk key
layouts — named (SSL trunks: resnet_projector.conv1...) and
Sequential-numeric (torchvision children: resnet_projector.0.weight,
resnet_projector.4.0.conv1..., model_wo_extra_params.py:56-58). The
parity suite exercises the named layout; this exercises the numeric one
end-to-end."""

import numpy as np
import torch

import jax.numpy as jnp

from duoformer_tcga_tpu.models.duoformer import DuoFormer
from duoformer_tcga_tpu.utils import torch_convert as tc

from torch_oracle import OracleDuoFormer

# torchvision child-module name -> Sequential index
_NUM = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
        "layer3": "6", "layer4": "7"}


def _to_numeric_layout(sd):
    out = {}
    for k, v in sd.items():
        if k.startswith("resnet_projector."):
            rest = k[len("resnet_projector."):]
            first, _, tail = rest.partition(".")
            if first in _NUM:
                k = f"resnet_projector.{_NUM[first]}" + ("." + tail if tail else "")
        out[k] = v
    return out


def test_numeric_trunk_layout_parity():
    torch.manual_seed(21)
    oracle = OracleDuoFormer(depth=1, embed_dim=96, num_heads=12,
                             num_classes=3, num_layers=2, proj_dim=96)
    oracle.eval()
    model = DuoFormer(depth=1, embed_dim=96, num_heads=12, num_classes=3,
                      num_layers=2, proj_dim=96, dtype=jnp.float32)

    sd_named = oracle.state_dict()
    sd_numeric = _to_numeric_layout(sd_named)
    assert "resnet_projector.0.weight" in sd_numeric
    assert "resnet_projector.4.0.conv1.weight" in sd_numeric

    p_named = tc.to_jax(tc.convert_duoformer(sd_named, model))
    p_numeric = tc.to_jax(tc.convert_duoformer(sd_numeric, model))
    for a, b in zip(
            [np.asarray(x) for x in __import__("jax").tree.leaves(p_named)],
            [np.asarray(x) for x in __import__("jax").tree.leaves(p_numeric)]):
        np.testing.assert_array_equal(a, b)

    x = torch.randn(1, 3, 224, 224)
    with torch.no_grad():
        ref = oracle(x).numpy()
    out = model.apply(p_numeric, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)
