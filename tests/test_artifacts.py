"""fetch-weights / verify-checkpoint (VERDICT r2 missing #1): the pinned
real-artifact registry, offline-clean planning, mocked fetching, and the
convert->parity verification path exercised on synthetic checkpoints in
the reference's exact formats (incl. the Q14 whole-object pickle)."""

import io
import json
import os

import numpy as np
import pytest
import torch

from duoformer_tcga_tpu.utils import artifacts


def test_registry_pins_reference_sources():
    """The pinned IDs/URLs are exactly the reference's."""
    a = artifacts.ARTIFACTS
    assert a["checkpoint1"]["file_id"] == "1AtnRSPbMJXQd7MPM_6nVAr1sq1CHS5Pr"
    assert a["checkpoint2"]["file_id"] == "1x4M0nyvqp0Cyn4joLb6Lvrn8W-JttqWv"
    assert a["ssl_swav"]["url"].endswith("swav_rn50_ep200.torch")
    assert "lunit-io/benchmark-ssl-pathology" in a["ssl_bt"]["url"]
    assert a["timm_r50_s16"]["model"] == "vit_base_r50_s16_224_in21k"
    assert (a["timm_r26_s32"]["model"]
            == "vit_small_r26_s32_224.augreg_in21k_ft_in1k")
    for name in a:
        p = artifacts.plan(name)
        assert p["source"] and p["dest"] and p["how"]


def test_fetch_offline_prints_plan(tmp_path, capsys):
    """Offline (fetcher returns False): no file, exact plan printed."""
    got = artifacts.fetch("checkpoint1", cache_dir=str(tmp_path),
                          fetcher=lambda url, dest: False)
    assert got is None
    out = capsys.readouterr().out
    assert "1AtnRSPbMJXQd7MPM_6nVAr1sq1CHS5Pr" in out
    assert "OFFLINE" in out and "verify-checkpoint" in out
    assert not os.listdir(tmp_path)


def test_fetch_with_mock_and_hash_pinning(tmp_path):
    def fake_fetch(url, dest):
        with open(dest, "wb") as f:
            f.write(b"weights-v1")
        return True

    p = artifacts.fetch("ssl_swav", cache_dir=str(tmp_path),
                        fetcher=fake_fetch)
    assert p and os.path.exists(p) and os.path.exists(p + ".sha256")
    # cached: no re-download
    assert artifacts.fetch("ssl_swav", cache_dir=str(tmp_path),
                           fetcher=lambda u, d: False) == p
    # tampered re-fetch against the pinned sidecar -> hard error
    os.remove(p)

    def tampered(url, dest):
        with open(dest, "wb") as f:
            f.write(b"weights-v2-evil")
        return True

    with pytest.raises(RuntimeError, match="sha256 mismatch"):
        artifacts.fetch("ssl_swav", cache_dir=str(tmp_path),
                        fetcher=tampered)


def test_cli_fetch_weights_offline(capsys):
    from duoformer_tcga_tpu import cli
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        rc = cli.main(["fetch-weights", f"--cache_dir={d}",
                       "--only=checkpoint2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "1x4M0nyvqp0Cyn4joLb6Lvrn8W-JttqWv" in out


def _save_q14_checkpoint(path, module):
    """The reference's whole-object format (main_toy.py:139-149)."""
    torch.save({"epoch": 3, "model": module, "tr_acc": [0.5],
                "te_acc": [0.6]}, path)


def test_verify_release_checkpoint_q14(tmp_path):
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from torch_oracle import OracleDuoFormer

    torch.manual_seed(0)
    om = OracleDuoFormer(depth=2, embed_dim=96, num_classes=3, proj_dim=96,
                         num_layers=2, scale_token="random")
    om.eval()
    path = str(tmp_path / "ck_release.pth")
    _save_q14_checkpoint(path, om)
    rep = artifacts.verify_duoformer_checkpoint(path, batch=2)
    assert rep["family"] == "release"
    assert rep["depth"] == 2 and rep["embed_dim"] == 96
    assert rep["num_classes"] == 3
    assert rep["pass"], rep


def test_verify_legacy_checkpoint(tmp_path):
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from torch_oracle import OracleDuoFormerLegacy

    torch.manual_seed(1)
    om = OracleDuoFormerLegacy(depth=2, embed_dim=96, num_classes=2,
                               proj_dim=96)
    om.eval()
    path = str(tmp_path / "ck_legacy.pth")
    torch.save({"model": om.state_dict()}, path)   # state_dict form
    rep = artifacts.verify_duoformer_checkpoint(path, batch=2)
    assert rep["family"] == "legacy"
    assert rep["pass"], rep


def test_cli_verify_checkpoint_file(tmp_path, capsys):
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from torch_oracle import OracleDuoFormer

    from duoformer_tcga_tpu import cli

    torch.manual_seed(2)
    om = OracleDuoFormer(depth=1, embed_dim=96, num_classes=2, proj_dim=96)
    om.eval()
    path = str(tmp_path / "ck.pth")
    _save_q14_checkpoint(path, om)
    rc = cli.main(["verify-checkpoint", f"--file={path}"])
    assert rc == 0
    out = capsys.readouterr().out
    rep = json.loads(out.strip().splitlines()[-1])
    assert rep["pass"] and rep["max_abs_diff"] <= 1e-4


def test_cli_verify_artifact_absent_prints_plan(tmp_path, capsys):
    from duoformer_tcga_tpu import cli

    rc = cli.main(["verify-checkpoint", "--artifact=ssl_bt",
                   f"--cache_dir={tmp_path}"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "bt_rn50_ep200.torch" in out and "fetch first" in out


def test_cli_verify_all(tmp_path, capsys):
    """--all walks the registry: present artifacts verify, absent ones
    print their fetch plan and count as skipped; exit stays 0 offline."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from torch_oracle import OracleDuoFormer

    from duoformer_tcga_tpu import cli

    torch.manual_seed(4)
    om = OracleDuoFormer(depth=1, embed_dim=96, num_classes=2, proj_dim=96)
    om.eval()
    _save_q14_checkpoint(
        artifacts.artifact_path("checkpoint1", cache_dir=str(tmp_path)), om)
    rc = cli.main(["verify-checkpoint", "--all", f"--cache_dir={tmp_path}"])
    assert rc == 0
    out = capsys.readouterr().out
    summary = json.loads(out.strip().splitlines()[-1].split("[verify-all] ")[1])
    assert summary["verified"] == 1 and not summary["failed"]
    assert set(summary["skipped"]) == set(artifacts.ARTIFACTS) - {"checkpoint1"}


def test_verify_resnet_trunk_roundtrip(tmp_path):
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from torch_oracle import OracleResNetTrunk

    torch.manual_seed(3)
    trunk = OracleResNetTrunk(50)
    trunk.eval()
    path = str(tmp_path / "trunk.torch")
    torch.save(trunk.state_dict(), path)
    rep = artifacts.verify_resnet_trunk(path, batch=1)
    assert rep["pass"], rep
