"""Pretrained registry: local-file loading path + r18 projection stages."""

import numpy as np
import pytest
import torch

import jax

from duoformer_tcga_tpu.models.projection import PROJ_STAGES, Projection
from duoformer_tcga_tpu.models.resnet import ResNetBackbone
from duoformer_tcga_tpu.utils import pretrained

from torch_oracle import OracleResNetTrunk


def test_registry_matches_reference():
    # resnet50ssl.py:51-55
    assert pretrained.SSL_REGISTRY == {
        "BT": "bt_rn50_ep200.torch",
        "MoCoV2": "mocov2_rn50_ep200.torch",
        "SwAV": "swav_rn50_ep200.torch",
    }
    assert pretrained.pretrained_url("SwAV").endswith("swav_rn50_ep200.torch")


def test_missing_cache_names_url():
    with pytest.raises(FileNotFoundError, match="swav_rn50_ep200"):
        pretrained.load_backbone("SwAV", cache_dir="/nonexistent")


def test_load_backbone_from_file(tmp_path):
    """A locally saved trunk state_dict loads and matches the torch
    forward (the resnet50ssl local-file path, resnet50ssl.py:65-67)."""
    torch.manual_seed(0)
    oracle = OracleResNetTrunk(50).eval()
    path = str(tmp_path / "swav_rn50_ep200.torch")
    torch.save(oracle.state_dict(), path)

    params = pretrained.load_backbone(path)
    bb = ResNetBackbone(50)
    x = torch.randn(1, 3, 224, 224)
    with torch.no_grad():
        ref = oracle(x)["3"].numpy()
    import jax.numpy as jnp
    out = bb.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))["3"]
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=2e-3, rtol=1e-3)


def test_r18_projection_stage_quirk():
    """r18 2-layer projects stages {2,1}, not {3,2}
    (projection_head.py:66-78)."""
    assert PROJ_STAGES["r18"][2] == ["2", "1"]
    proj = Projection(num_layers=2, proj_dim=32, backbone="r18")
    params = proj.init(jax.random.PRNGKey(0))
    assert set(params.keys()) == {"2", "1"}
    assert params["2"]["w"].shape == (1, 1, 256, 32)
    assert params["1"]["w"].shape == (1, 1, 128, 32)
