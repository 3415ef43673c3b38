"""--torch= serving for the baseline families: _weights_for_serving now
converts HybridModel and ViTBase16 checkpoints on the fly (previously
duoformer-families-only), so every reference model family evaluates/serves
through the same CLI weight sources."""

import numpy as np
import torch

import jax.numpy as jnp

import pytest

from duoformer_tcga_tpu import cli
from duoformer_tcga_tpu import config as config_lib


def _cfg(args):
    return config_lib.from_args(["--model.dtype=float32",
                                 "--train.platform=cpu", *args])


def test_hybrid_torch_checkpoint_serves(tmp_path):
    from torch_oracle import OracleHybridModel

    torch.manual_seed(11)
    oracle = OracleHybridModel(num_classes=5, num_blocks=2, proj_dim=96,
                               num_heads=12).eval()
    ck = str(tmp_path / "hybrid.pt")
    torch.save(oracle.state_dict(), ck)

    cfg = _cfg(["--model.family=hybrid", "--model.depth=2",
                "--model.proj_dim=96", "--model.num_classes=5"])
    model, _mesh, opt, _, _, _ = cli._build(cfg)
    serve, meta = cli._weights_for_serving(cfg, model, opt,
                                           torch_path=ck)
    assert meta is None
    x = torch.randn(2, 3, 224, 224)
    with torch.no_grad():
        ref = oracle(x).numpy()
    out = np.asarray(model.apply(serve,
                                 jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_vit_prefix_detection(tmp_path, monkeypatch):
    """Plain-ViT checkpoints may carry the reference wrapper's 'model.'
    attribute prefix or bare timm keys; the dispatch detects which."""
    from duoformer_tcga_tpu.utils import torch_convert as tc

    seen = {}

    def fake_convert_vit(sd, depth, prefix="", patch_embed=True):
        seen["prefix"] = prefix
        return {"stub": torch.zeros(1).numpy()}

    monkeypatch.setattr(tc, "convert_vit", fake_convert_vit)
    cfg = _cfg(["--model.family=vit", "--model.num_classes=3"])
    model, _mesh, opt, _, _, _ = cli._build(cfg)

    for keys, want in ((["model.cls_token"], "model."),
                       (["cls_token"], "")):
        ck = str(tmp_path / f"vit_{want or 'bare'}.pt")
        torch.save({k: torch.zeros(1) for k in keys}, ck)
        serve, _ = cli._weights_for_serving(cfg, model, opt, torch_path=ck)
        assert seen["prefix"] == want
        assert "model" in serve


def test_unsupported_family_is_loud(tmp_path):
    ck = str(tmp_path / "x.pt")
    torch.save({"w": torch.zeros(1)}, ck)
    cfg = _cfg(["--model.family=resnet50_fc", "--model.num_classes=4"])
    model, _mesh, opt, _, _, _ = cli._build(cfg)
    with pytest.raises(ValueError, match="families"):
        cli._weights_for_serving(cfg, model, opt, torch_path=ck)
