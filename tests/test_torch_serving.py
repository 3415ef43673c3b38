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


def test_resnet50_fc_torch_checkpoint_serves(tmp_path):
    """The SSL linear-probe baseline (resnet50ssl.py:104-123) converts
    and serves via --torch= with logit parity (resnet_trunk.* + fc.*)."""
    from torch_oracle import OracleResNetTrunk

    torch.manual_seed(5)

    class OracleRes50FC(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.resnet_trunk = OracleResNetTrunk(50)
            self.fc = torch.nn.Linear(2048, 4)

        def forward(self, x):
            h = self.resnet_trunk(x)["3"]
            h = torch.nn.functional.adaptive_avg_pool2d(h, 1).flatten(1)
            return self.fc(h)

    oracle = OracleRes50FC().eval()
    ck = str(tmp_path / "r50fc.pt")
    torch.save(oracle.state_dict(), ck)
    cfg = _cfg(["--model.family=resnet50_fc", "--model.num_classes=4"])
    model, _mesh, opt, _, _, _ = cli._build(cfg)
    serve, _ = cli._weights_for_serving(cfg, model, opt, torch_path=ck)
    x = torch.randn(2, 3, 224, 224)
    with torch.no_grad():
        ref = oracle(x).numpy()
    out = np.asarray(model.apply(serve,
                                 jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_scaleformer_family_has_no_driver():
    """The scaleformer preset is a transformer core, not an image
    classifier — the CLI drivers must refuse it loudly instead of
    letting apply() hit a broadcast error on image input."""
    cfg = _cfg(["--preset=scaleformer-only"])
    with pytest.raises(ValueError, match="transformer core"):
        cli._build(cfg)


def test_baseline_frozen_labels_block_decay():
    """CLI-trained baseline families must not weight-decay frozen trunks
    or BN running stats (torch buffers / requires_grad=False params get
    no decay because they never receive gradients)."""
    import jax
    import optax

    from duoformer_tcga_tpu import train as train_lib

    params = {"trunk": {"conv": {"w": jnp.ones((2,))},
                        "bn": {"mean": jnp.ones((2,)),
                               "var": jnp.ones((2,))}},
              "fc": {"w": jnp.ones((2,))}}
    labels = train_lib.trunk_frozen_labels(params)
    assert labels["trunk"]["conv"]["w"] == "frozen"
    assert labels["trunk"]["bn"]["mean"] == "frozen"
    assert labels["fc"]["w"] == "train"

    opt = train_lib.make_optimizer(lambda _: 1e-2, weight_decay=1e-2,
                                   frozen_label_fn=train_lib.trunk_frozen_labels)
    state = opt.init(params)
    zero_g = jax.tree.map(jnp.zeros_like, params)
    updates, _ = opt.update(zero_g, state, params)
    # frozen leaves: exactly zero update even under decay; fc decays
    assert float(jnp.abs(updates["trunk"]["conv"]["w"]).max()) == 0.0
    assert float(jnp.abs(updates["trunk"]["bn"]["mean"]).max()) == 0.0
    assert float(jnp.abs(updates["fc"]["w"]).max()) > 0.0

    # hybrid: BN stats frozen, conv weights trainable
    hp = {"backbone": {"bn": {"mean": jnp.ones((2,)),
                              "scale": jnp.ones((2,))}}}
    hl = train_lib.bn_stat_frozen_labels(hp)
    assert hl["backbone"]["bn"]["mean"] == "frozen"
    assert hl["backbone"]["bn"]["scale"] == "train"


def test_build_assigns_baseline_label_fns():
    from duoformer_tcga_tpu import train as train_lib

    cfg = _cfg(["--model.family=resnet50_fc", "--model.num_classes=4"])
    assert cli._build(cfg)[5] is train_lib.trunk_frozen_labels
    cfg = _cfg(["--model.family=hybrid", "--model.depth=1",
                "--model.proj_dim=96"])
    assert cli._build(cfg)[5] is train_lib.bn_stat_frozen_labels


def test_warm_start_hybrid_with_head_transfer(tmp_path):
    """--train.init_from now fine-tunes baseline checkpoints too: hybrid
    checkpoint + new class count -> trunk/blocks loaded, head fresh;
    without reinit_head the head mismatch fails loudly."""
    import jax

    from duoformer_tcga_tpu import train as train_lib
    from duoformer_tcga_tpu.models.baselines import HybridModel
    from duoformer_tcga_tpu.utils import torch_convert as tc
    from torch_oracle import OracleHybridModel

    torch.manual_seed(7)
    oracle = OracleHybridModel(num_classes=5, num_blocks=2, proj_dim=96,
                               num_heads=12)
    ck = str(tmp_path / "h.pt")
    torch.save(oracle.state_dict(), ck)

    model = HybridModel(num_classes=7, num_blocks=2, proj_dim=96,
                        num_heads=12, dtype=jnp.float32)
    fresh = model.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="reinit_head"):
        train_lib.warm_start_params(model, fresh, init_from=ck,
                                    family="hybrid")
    params = train_lib.warm_start_params(model, fresh, init_from=ck,
                                         family="hybrid", reinit_head=True)
    np.testing.assert_array_equal(np.asarray(params["vit"]["head"]["w"]),
                                  np.asarray(fresh["vit"]["head"]["w"]))
    want = tc.to_jax(tc.convert_hybrid(oracle.state_dict(), model))
    np.testing.assert_allclose(
        np.asarray(params["backbone"]["conv1"]["w"]),
        np.asarray(want["backbone"]["conv1"]["w"]), atol=1e-6)


def test_warm_start_resnet50_fc(tmp_path):
    import jax

    from duoformer_tcga_tpu import train as train_lib
    from duoformer_tcga_tpu.models.resnet import ResNet50withFC
    from torch_oracle import OracleResNetTrunk

    torch.manual_seed(8)

    class OracleRes50FC(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.resnet_trunk = OracleResNetTrunk(50)
            self.fc = torch.nn.Linear(2048, 4)

    ck = str(tmp_path / "r.pt")
    torch.save(OracleRes50FC().state_dict(), ck)
    model = ResNet50withFC(num_classes=2, dtype=jnp.float32)
    fresh = model.init(jax.random.PRNGKey(0))
    params = train_lib.warm_start_params(model, fresh, init_from=ck,
                                         family="resnet50_fc",
                                         reinit_head=True)
    np.testing.assert_array_equal(np.asarray(params["fc"]["w"]),
                                  np.asarray(fresh["fc"]["w"]))
    assert params["trunk"]["conv1"]["w"].shape == (7, 7, 3, 64)


def test_cli_trains_resnet50_fc(tmp_path):
    """The linear-probe family trains through the generic step (its
    apply must tolerate the step's rng kwarg)."""
    assert cli.main([
        "train", "--model.family=resnet50_fc", "--model.num_classes=2",
        "--model.dtype=float32", "--train.platform=cpu",
        "--train.batch_size=8", "--steps=1",
        f"--train.checkpoint_dir={tmp_path}/ck"]) == 0


def test_cli_trains_hybrid_and_updates_bn_stats(tmp_path):
    """Hybrid training threads BN running-stat updates (torch train-mode
    semantics) — without it, eval-mode BN would forever see the
    random-init stats."""
    import jax

    from duoformer_tcga_tpu import config as config_lib

    cfg = config_lib.from_args([
        "--model.family=hybrid", "--model.depth=1", "--model.proj_dim=96",
        "--model.num_classes=2", "--model.dtype=float32",
        "--train.platform=cpu", "--train.batch_size=8"])
    state = cli.cmd_train(cfg, max_steps=1)
    fresh = cfg.model.build().init(jax.random.PRNGKey(cfg.train.seed))
    got = np.asarray(jax.device_get(
        state["params"]["backbone"]["bn1"]["mean"]))
    init = np.asarray(fresh["backbone"]["bn1"]["mean"])
    assert np.abs(got - init).max() > 0          # running stats moved
