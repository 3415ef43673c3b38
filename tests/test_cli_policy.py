"""Regression tests for the round-3 self-review findings on cmd_train's
memory-policy wiring: the --steps clamp must survive the remat rebuild,
and the policy's DUOFORMER_MLP_SAVE_HIDDEN env write must not leak out
of cmd_train (it would disable re-planning for every later call in the
process and silently change kernel behavior for unrelated work)."""

import json
import os

import pytest

from duoformer_tcga_tpu import cli
from duoformer_tcga_tpu import train as train_lib


def _args(tmp_path, extra=()):
    return [
        "train", "--preset=release-2scale", "--model.depth=1",
        "--model.embed_dim=96", "--model.proj_dim=96",
        "--model.dtype=float32", "--train.platform=cpu",
        "--train.batch_size=8", "--steps=1",
        "--train.dataset=synthetic",
        f"--train.checkpoint_dir={tmp_path}/ck",
        *extra,
    ]


def _logged_steps(tmp_path):
    with open(os.path.join(tmp_path, "ck", "metrics.jsonl")) as f:
        return [json.loads(line)["step"] for line in f if line.strip()]


def test_save_hidden_env_restored_after_train(tmp_path, monkeypatch):
    """A plan with save_hidden=False sets the kernel env knob for the
    duration of training only; afterwards the environment is clean."""
    monkeypatch.delenv("DUOFORMER_MLP_SAVE_HIDDEN", raising=False)
    monkeypatch.setattr(
        train_lib, "plan_train_memory",
        lambda *a, **k: {"accum_steps": 1, "save_hidden": False,
                         "remat": False, "reason": "stub"})
    cli.main(_args(tmp_path))
    assert "DUOFORMER_MLP_SAVE_HIDDEN" not in os.environ
    # pre-existing user setting is preserved verbatim
    monkeypatch.setenv("DUOFORMER_MLP_SAVE_HIDDEN", "1")
    cli.main(_args(tmp_path, [f"--train.checkpoint_dir={tmp_path}/ck2"]))
    assert os.environ["DUOFORMER_MLP_SAVE_HIDDEN"] == "1"


def test_steps_clamp_survives_remat_rebuild(tmp_path, monkeypatch):
    """When the policy chooses remat, cmd_train rebuilds the model — the
    rebuild must not resurrect the full steps_per_epoch*epochs schedule
    over an explicit --steps cap."""
    monkeypatch.delenv("DUOFORMER_MLP_SAVE_HIDDEN", raising=False)
    monkeypatch.setattr(
        train_lib, "plan_train_memory",
        lambda *a, **k: {"accum_steps": 1, "save_hidden": True,
                         "remat": True, "reason": "stub"})
    cli.main(_args(tmp_path))
    steps = _logged_steps(tmp_path)
    assert steps and max(steps) == 1


def _q7_cfg(extra=()):
    from duoformer_tcga_tpu import config as config_lib

    return config_lib.from_args(["--preset=release-2scale", *extra])


def test_q7_knife_edge_warning_matrix():
    """The measured-fact warning (VERDICT r4 #4) fires exactly for the
    release family, from scratch, deep, without the fc_norm fix."""
    assert cli.q7_knife_edge_warning(_q7_cfg()) is not None  # depth 12
    warn = cli.q7_knife_edge_warning(_q7_cfg(["--model.depth=6"]))
    assert warn and "apply_fc_norm" in warn
    # not under the opt-in Q7 fix
    assert cli.q7_knife_edge_warning(
        _q7_cfg(["--model.apply_fc_norm=true"])) is None
    # not under a full-model warm start
    assert cli.q7_knife_edge_warning(
        _q7_cfg(["--train.init_from=ck.pt"])) is None
    # init_backbone alone does NOT suppress it (trunk != transformer)
    assert cli.q7_knife_edge_warning(
        _q7_cfg(["--train.init_backbone=trunk.pt"])) is not None
    # not at shallow depth
    assert cli.q7_knife_edge_warning(_q7_cfg(["--model.depth=2"])) is None
    # not for other families
    assert cli.q7_knife_edge_warning(
        _q7_cfg(["--preset=legacy-channel"])) is None


def test_q7_warning_prints_in_cmd_train(tmp_path, capsys):
    """End-to-end: a fresh deep release run prints the warning; the
    shallow default test config does not."""
    assert cli.main(_args(tmp_path, ["--model.depth=6"])) == 0
    assert "Q7 CLS attenuation" in capsys.readouterr().out
    assert cli.main(
        _args(tmp_path, [f"--train.checkpoint_dir={tmp_path}/ck3"])) == 0
    assert "Q7 CLS attenuation" not in capsys.readouterr().out
