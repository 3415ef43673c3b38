"""Named-optimizer parity vs torch: adamw (decoupled decay) and sgd
(momentum buffer) step-for-step against torch.optim, plus selection
plumbing. The reference trains with Adam only (main_toy.py:111, parity
in test_train.py); adamw/sgd are framework capability beyond it."""

import numpy as np
import torch

import jax
import jax.numpy as jnp
import optax

import pytest

from duoformer_tcga_tpu import train as train_lib


def _run_pair(opt_t, lin, opt_j, params, steps=5):
    x = torch.randn(6, 4)

    def loss_j(p):
        return 0.5 * jnp.sum((jnp.asarray(x.numpy()) @ p["w"]) ** 2)

    state = opt_j.init(params)
    for _ in range(steps):
        opt_t.zero_grad()
        (0.5 * (x @ lin).pow(2).sum()).backward()
        opt_t.step()
        updates, state = opt_j.update(jax.grad(loss_j)(params), state,
                                      params)
        params = optax.apply_updates(params, updates)
    return lin.detach().numpy(), np.asarray(params["w"])


def test_adamw_matches_torch():
    """Decoupled decay: the wd term must NOT pass through the Adam
    moments (that is what distinguishes adamw from the reference's
    adam+L2)."""
    torch.manual_seed(1)
    w0 = torch.randn(4, 3)
    lin = torch.nn.Parameter(w0.clone())
    opt_t = torch.optim.AdamW([lin], lr=1e-3, weight_decay=1e-2)
    opt_j = train_lib.make_optimizer(lambda _: 1e-3, weight_decay=1e-2,
                                     kind="adamw")
    t, j = _run_pair(opt_t, lin, opt_j, {"w": jnp.asarray(w0.numpy())})
    np.testing.assert_allclose(j, t, atol=1e-6, rtol=1e-5)


def test_sgd_momentum_matches_torch():
    torch.manual_seed(2)
    w0 = torch.randn(4, 3)
    lin = torch.nn.Parameter(w0.clone())
    opt_t = torch.optim.SGD([lin], lr=1e-2, momentum=0.9,
                            weight_decay=1e-3)
    opt_j = train_lib.make_optimizer(lambda _: 1e-2, weight_decay=1e-3,
                                     kind="sgd", momentum=0.9)
    t, j = _run_pair(opt_t, lin, opt_j, {"w": jnp.asarray(w0.numpy())})
    np.testing.assert_allclose(j, t, atol=1e-6, rtol=1e-5)


def test_sgd_no_momentum_matches_torch():
    torch.manual_seed(3)
    w0 = torch.randn(4, 2)
    lin = torch.nn.Parameter(w0.clone())
    opt_t = torch.optim.SGD([lin], lr=5e-3, momentum=0.0)
    opt_j = train_lib.make_optimizer(lambda _: 5e-3, weight_decay=0.0,
                                     kind="sgd", momentum=0.0)
    t, j = _run_pair(opt_t, lin, opt_j, {"w": jnp.asarray(w0.numpy())})
    np.testing.assert_allclose(j, t, atol=1e-7, rtol=1e-6)


def test_adam_vs_adamw_actually_differ():
    """Guard against both kinds silently aliasing to the same chain."""
    w0 = np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32)
    outs = {}
    for kind in ("adam", "adamw"):
        params = {"w": jnp.asarray(w0)}
        opt = train_lib.make_optimizer(lambda _: 1e-2, weight_decay=0.5,
                                       kind=kind)
        state = opt.init(params)
        g = jax.grad(lambda p: jnp.sum(p["w"] ** 2))(params)
        for _ in range(3):
            updates, state = opt.update(g, state, params)
            params = optax.apply_updates(params, updates)
        outs[kind] = np.asarray(params["w"])
    assert np.abs(outs["adam"] - outs["adamw"]).max() > 1e-5


def test_unknown_kind_raises():
    with pytest.raises(ValueError, match="optimizer"):
        train_lib.make_optimizer(lambda _: 1e-3, kind="lamb")


def test_frozen_partition_composes_with_kinds():
    """The frozen multi_transform wrapper works for every kind: frozen
    leaves get exactly zero updates (no decay leak)."""
    params = {"backbone": {"w": jnp.ones((2,))},
              "transformer": {"w": jnp.ones((2,))}}
    g = {"backbone": {"w": jnp.ones((2,))},
         "transformer": {"w": jnp.ones((2,))}}
    for kind in ("adam", "adamw", "sgd"):
        opt = train_lib.make_optimizer(
            lambda _: 1e-2, weight_decay=1e-2, kind=kind,
            frozen_label_fn=train_lib.backbone_frozen_labels)
        state = opt.init(params)
        updates, _ = opt.update(g, state, params)
        np.testing.assert_array_equal(
            np.asarray(updates["backbone"]["w"]), np.zeros((2,)))
        assert np.abs(np.asarray(updates["transformer"]["w"])).max() > 0


def test_cli_build_uses_optimizer_field():
    """--train.optimizer reaches make_optimizer through _build."""
    from duoformer_tcga_tpu import cli as cli_lib
    from duoformer_tcga_tpu import config as config_lib

    cfg = config_lib.from_args([
        "--preset=release-2scale", "--model.depth=1",
        "--model.embed_dim=96", "--model.proj_dim=96",
        "--model.dtype=float32", "--train.platform=cpu",
        "--train.optimizer=bogus"])
    with pytest.raises(ValueError, match="optimizer"):
        cli_lib._build(cfg)
