"""Pinned real-artifact registry: fetch + verify in one command.

The framework's parity story bottoms out in the self-built torch oracle
because this environment has no network egress: the reference's released
Checkpoint1/2 (/root/reference/README.md:12-13), the lunit-io SSL trunks
(/root/reference/models/resnet50ssl.py:48-57), and the timm hybrid weights
(/root/reference/models/model.py:418-441) have never been loaded here.
This module turns the remaining validation into a 5-minute check for any
CONNECTED environment (VERDICT r2 missing #1):

    python -m duoformer_tcga_tpu.cli fetch-weights            # download all
    python -m duoformer_tcga_tpu.cli verify-checkpoint \
        --artifact=checkpoint1                                # logit parity

Offline, both commands print the exact plan (pinned URL, destination,
follow-up command) and skip cleanly. The fetcher is injectable so the
whole flow is testable with a mock (tests/test_artifacts.py).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Callable, Dict, Optional

DEFAULT_CACHE = os.environ.get(
    "DUOFORMER_WEIGHTS_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "duoformer_tcga_tpu"))

_LUNIT = ("https://github.com/lunit-io/benchmark-ssl-pathology/releases/"
          "download/pretrained-weights")


def _gdrive_url(file_id: str) -> str:
    return f"https://drive.google.com/uc?export=download&id={file_id}"


# Every artifact the reference depends on, with its pinned source.
# sha256 is recorded on first successful fetch (sidecar .sha256 file) and
# verified on later fetches; the registry itself pins None because the
# files have never been downloadable from this environment.
ARTIFACTS: Dict[str, Dict] = {
    "checkpoint1": {
        "kind": "gdrive",
        "file_id": "1AtnRSPbMJXQd7MPM_6nVAr1sq1CHS5Pr",
        "filename": "duoformer_checkpoint1.pth",
        "verify": "duoformer",
        "ref": "/root/reference/README.md:12",
        "desc": "released full-model checkpoint #1 (Q14 whole-object "
                "pickle: epoch/model/optimizer/scheduler)",
    },
    "checkpoint2": {
        "kind": "gdrive",
        "file_id": "1x4M0nyvqp0Cyn4joLb6Lvrn8W-JttqWv",
        "filename": "duoformer_checkpoint2.pth",
        "verify": "duoformer",
        "ref": "/root/reference/README.md:13",
        "desc": "released full-model checkpoint #2",
    },
    "ssl_bt": {
        "kind": "url",
        "url": f"{_LUNIT}/bt_rn50_ep200.torch",
        "filename": "bt_rn50_ep200.torch",
        "verify": "resnet_trunk",
        "ref": "/root/reference/models/resnet50ssl.py:49-56",
        "desc": "lunit-io Barlow-Twins ResNet-50 TCGA+TULIP trunk",
    },
    "ssl_mocov2": {
        "kind": "url",
        "url": f"{_LUNIT}/mocov2_rn50_ep200.torch",
        "filename": "mocov2_rn50_ep200.torch",
        "verify": "resnet_trunk",
        "ref": "/root/reference/models/resnet50ssl.py:49-56",
        "desc": "lunit-io MoCo-v2 ResNet-50 trunk",
    },
    "ssl_swav": {
        "kind": "url",
        "url": f"{_LUNIT}/swav_rn50_ep200.torch",
        "filename": "swav_rn50_ep200.torch",
        "verify": "resnet_trunk",
        "ref": "/root/reference/models/resnet50ssl.py:49-56",
        "desc": "lunit-io SwAV ResNet-50 trunk (the r50_Swav backbone, "
                "model_wo_extra_params.py:66-70)",
    },
    "timm_r50_s16": {
        "kind": "timm",
        "model": "vit_base_r50_s16_224_in21k",
        "filename": "vit_base_r50_s16_224_in21k.pth",
        "verify": "timm_hybrid",
        "ref": "/root/reference/models/model.py:421-429",
        "desc": "timm R50+ViT-B/16 hybrid (ViTBase16 'ViTPretrained' / "
                "'R50ViTPretrained')",
    },
    "timm_r26_s32": {
        "kind": "timm",
        "model": "vit_small_r26_s32_224.augreg_in21k_ft_in1k",
        "filename": "vit_small_r26_s32_224_augreg.pth",
        "verify": "timm_hybrid",
        "ref": "/root/reference/models/model.py:436-441",
        "desc": "timm R26+ViT-S/32 hybrid (ViTBase16 'R50ViT')",
    },
}


def _lookup(name: str) -> Dict:
    """Registry lookup with an actionable error (a raw KeyError from a
    CLI typo like --artifact=checkpoint3 helps nobody)."""
    if name not in ARTIFACTS:
        raise ValueError(f"unknown artifact '{name}'; known artifacts: "
                         f"{', '.join(sorted(ARTIFACTS))}")
    return ARTIFACTS[name]


def artifact_path(name: str, cache_dir: Optional[str] = None) -> str:
    return os.path.join(cache_dir or DEFAULT_CACHE,
                        _lookup(name)["filename"])


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def plan(name: str, cache_dir: Optional[str] = None) -> Dict:
    """The exact fetch a connected environment would run."""
    a = _lookup(name)
    dest = artifact_path(name, cache_dir)
    if a["kind"] == "gdrive":
        src = _gdrive_url(a["file_id"])
        how = (f"download {src} -> {dest} (Google Drive large files need "
               f"the confirm-token dance; `gdown {a['file_id']}` handles "
               f"it)")
    elif a["kind"] == "url":
        src = a["url"]
        how = f"download {src} -> {dest}"
    else:
        src = f"timm:{a['model']}"
        how = (f"python -c \"import timm, torch; m = timm.create_model("
               f"'{a['model']}', pretrained=True); "
               f"torch.save(m.state_dict(), '{dest}')\"")
    return {"name": name, "source": src, "dest": dest, "how": how,
            "verify_cmd": f"cli verify-checkpoint --artifact={name}",
            "ref": a["ref"], "desc": a["desc"]}


def _default_fetcher(url: str, dest: str) -> bool:
    """urllib fetch with the Google-Drive confirm-token dance. Returns
    False on any network failure (offline environments)."""
    import urllib.request

    try:
        if "drive.google.com" in url:
            import http.cookiejar
            import re

            jar = http.cookiejar.CookieJar()
            op = urllib.request.build_opener(
                urllib.request.HTTPCookieProcessor(jar))
            with op.open(url, timeout=60) as r:
                head = r.read(1 << 16)
            token = None
            m = re.search(rb"confirm=([0-9A-Za-z_\-]+)", head)
            if m:
                token = m.group(1).decode()
            for c in jar:
                if c.name.startswith("download_warning"):
                    token = c.value
            if token:
                url = f"{url}&confirm={token}"
            with op.open(url, timeout=300) as r, open(dest, "wb") as f:
                while True:
                    chunk = r.read(1 << 20)
                    if not chunk:
                        break
                    f.write(chunk)
            return True
        with urllib.request.urlopen(url, timeout=300) as r, \
                open(dest, "wb") as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
        return True
    except Exception as e:  # noqa: BLE001 — offline is the expected case
        print(f"  fetch failed ({type(e).__name__}: {e})", flush=True)
        return False


def fetch(name: str, cache_dir: Optional[str] = None,
          fetcher: Optional[Callable[[str, str], bool]] = None) -> Optional[str]:
    """Fetch one artifact into the cache. Returns the local path, or None
    when offline (after printing the exact plan). Downloads stream to a
    .part temp and rename only on success, so an interrupted transfer can
    never masquerade as a cached artifact. A sidecar .sha256 is written
    on first success and checked on re-fetch AND on cache hits."""
    a = _lookup(name)
    dest = artifact_path(name, cache_dir)
    p = plan(name, cache_dir)
    side = dest + ".sha256"
    if os.path.exists(dest):
        if os.path.exists(side):
            pinned = open(side).read().split()[0]
            digest = _sha256(dest)
            if pinned != digest:
                raise RuntimeError(
                    f"{name}: cached {dest} does not match its pinned "
                    f"sha256 ({pinned[:12]}… vs {digest[:12]}…) — "
                    f"truncated download or re-released artifact; delete "
                    f"BOTH the file and {side} to re-fetch and re-pin")
        print(f"[{name}] cached: {dest}", flush=True)
        return dest
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    print(f"[{name}] {a['desc']}\n  source: {p['source']}\n"
          f"  dest:   {dest}", flush=True)
    tmp = dest + ".part"
    if a["kind"] == "timm":
        ok = _fetch_timm(a["model"], tmp) if fetcher is None \
            else fetcher(p["source"], tmp)
    else:
        ok = (fetcher or _default_fetcher)(p["source"], tmp)
    if not ok or not os.path.exists(tmp):
        if os.path.exists(tmp):
            os.remove(tmp)
        print(f"  OFFLINE — run in a connected environment:\n"
              f"    {p['how']}\n  then: {p['verify_cmd']}", flush=True)
        return None
    digest = _sha256(tmp)
    if os.path.exists(side):
        pinned = open(side).read().split()[0]
        if pinned != digest:
            os.remove(tmp)
            raise RuntimeError(
                f"{name}: sha256 mismatch (pinned {pinned[:12]}…, "
                f"got {digest[:12]}…) — if the artifact was legitimately "
                f"re-released, delete {side} to re-pin")
    else:
        with open(side, "w") as f:
            f.write(f"{digest}  {os.path.basename(dest)}\n")
    os.replace(tmp, dest)
    print(f"  fetched, sha256={digest[:16]}…", flush=True)
    return dest


def _fetch_timm(model_name: str, dest: str) -> bool:
    try:
        import timm  # noqa: F401
        import torch

        m = timm.create_model(model_name, pretrained=True)
        torch.save(m.state_dict(), dest)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"  timm fetch failed ({type(e).__name__}: {e})", flush=True)
        return False


def fetch_all(cache_dir: Optional[str] = None,
              fetcher: Optional[Callable] = None,
              only: Optional[str] = None) -> Dict[str, Optional[str]]:
    names = [only] if only else list(ARTIFACTS)
    return {n: fetch(n, cache_dir, fetcher) for n in names}


# ---------------------------------------------------------------------------
# Verification: convert + logit parity against a live torch forward
# ---------------------------------------------------------------------------


def _oracle_module():
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "tests"))
    import torch_oracle
    return torch_oracle


def verify_duoformer_checkpoint(path: str, legacy: Optional[bool] = None,
                                batch: int = 2, tol: float = 1e-4) -> Dict:
    """Load a reference checkpoint (state_dict or Q14 whole-object pickle),
    convert to JAX, load the SAME weights into the torch oracle, and
    compare logits on a fixed random batch. The BASELINE.md bar is
    max|diff| <= 1e-4 in f32."""
    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    from .. import build_model, build_model_no_extra_params
    from . import torch_convert as tc

    import re

    sd = tc.state_dict_from_reference_checkpoint(path)
    if legacy is None:
        legacy = any(k.endswith("qkv1.weight") for k in sd)
    # infer architecture from the checkpoint itself (real checkpoints use
    # the reference's `vision_transformer.` attribute prefix)
    qkv_sub = "attn.qkv1.weight" if legacy else "attn.qkv.weight"
    qkv_key = next(k for k in sd if k.endswith(qkv_sub))
    C = sd[qkv_key].shape[1]
    blk_re = re.compile(r"\.(?:blocks|scaleBlocks)\.(\d+)\.")
    depth = 1 + max(int(m.group(1)) for k in sd
                    for m in [blk_re.search("." + k)] if m)
    head_key = next((k for k in sd if k.endswith("head.weight")), None)
    ncls = sd[head_key].shape[0] if head_key is not None else 2
    has_ls = any(k.endswith("ls1.gamma") for k in sd)
    has_qk = any("q_norm" in k for k in sd)
    scale_token = ("random" if any(k.endswith("channel_token") for k in sd)
                   else "channel")
    to = _oracle_module()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((batch, 224, 224, 3)).astype(np.float32)

    # proj_dim == embed_dim in every reference config (768); inferring it
    # this way also lets small synthetic test checkpoints verify
    if legacy:
        model = build_model(num_classes=ncls, embed_dim=C, depth=depth,
                            proj_dim=C, pretrained=False,
                            dtype=jnp.float32)
        params = tc.to_jax(tc.convert_duoformer_legacy(sd, model))
        om = to.OracleDuoFormerLegacy(depth=depth, embed_dim=C,
                                      num_classes=ncls, proj_dim=C)
    else:
        model = build_model_no_extra_params(
            num_classes=ncls, embed_dim=C, depth=depth, proj_dim=C,
            scale_token=scale_token, dtype=jnp.float32)
        params = tc.to_jax(tc.convert_duoformer(sd, model))
        om = to.OracleDuoFormer(
            depth=depth, embed_dim=C, num_classes=ncls, proj_dim=C,
            scale_token=scale_token,
            init_values=1e-5 if has_ls else None, qk_norm=has_qk)
    missing, unexpected = om.load_state_dict(
        {k: torch.as_tensor(v) for k, v in sd.items()}, strict=False)
    om.eval()
    with torch.no_grad():
        ref = om(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(jax.jit(lambda p, v: model.apply(p, v))(
        params, jnp.asarray(x)), np.float32)
    diff = float(np.abs(got - ref.reshape(got.shape)).max())
    return {"path": path, "family": "legacy" if legacy else "release",
            "depth": depth, "embed_dim": C, "num_classes": ncls,
            "max_abs_diff": diff, "tol": tol, "pass": diff <= tol,
            "oracle_missing_keys": len(missing),
            "oracle_unexpected_keys": len(unexpected)}


def verify_resnet_trunk(path: str, batch: int = 2, tol: float = 1e-4) -> Dict:
    """Convert an SSL trunk file and compare the 4-stage pyramid against
    the torch oracle trunk loaded with the same weights."""
    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    from ..models.resnet import ResNetBackbone
    from . import torch_convert as tc

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    sd = {k: tc._t(v) for k, v in sd.items()
          if hasattr(v, "shape") or hasattr(v, "detach")}
    params = tc.to_jax(tc.convert_resnet(sd, depth=50))
    to = _oracle_module()
    om = to.OracleResNetTrunk()
    om.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items()},
                       strict=False)
    om.eval()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((batch, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        ref = om(torch.from_numpy(x).permute(0, 3, 1, 2))
    bb = ResNetBackbone(50, jnp.float32)
    feats = jax.jit(lambda p, v: bb.apply(p, v))(params, jnp.asarray(x))
    diffs = []
    for k in ("0", "1", "2", "3"):    # both sides return stage dicts
        d = float(np.abs(np.asarray(feats[k], np.float32)
                         - ref[k].permute(0, 2, 3, 1).numpy()).max())
        diffs.append(d)
    return {"path": path, "stage_max_abs_diff": diffs,
            "max_abs_diff": max(diffs), "tol": tol,
            "pass": max(diffs) <= tol}


def verify(name: str, cache_dir: Optional[str] = None,
           path: Optional[str] = None) -> Optional[Dict]:
    """Verify one artifact (by registry name, or an explicit local file).
    Returns the report dict, or None when the file is absent (prints the
    fetch plan)."""
    a = _lookup(name)
    f = path or artifact_path(name, cache_dir)
    if not os.path.exists(f):
        p = plan(name, cache_dir)
        print(f"[{name}] not present: {f}\n  fetch first: {p['how']}",
              flush=True)
        return None
    if a["verify"] == "duoformer":
        rep = verify_duoformer_checkpoint(f)
    elif a["verify"] == "resnet_trunk":
        rep = verify_resnet_trunk(f)
    else:
        rep = _verify_timm_hybrid(f, a["model"])
    print(f"[{name}] " + json.dumps(rep), flush=True)
    return rep


def verify_all(cache_dir: Optional[str] = None) -> Dict:
    """Verify every artifact in the registry in one pass (the
    connected-environment runbook: `cli fetch-weights --all` then
    `cli verify-checkpoint --all`). Absent files print their fetch plan
    and count as skipped — offline runs stay clean. Returns
    {"verified": n, "failed": [names], "skipped": [names]}."""
    failed, skipped, verified = [], [], 0
    for name in ARTIFACTS:
        rep = verify(name, cache_dir=cache_dir)
        if rep is None:
            skipped.append(name)
        elif rep.get("pass"):
            verified += 1
        else:
            failed.append(name)
    summary = {"verified": verified, "failed": failed, "skipped": skipped}
    print("[verify-all] " + json.dumps(summary), flush=True)
    return summary


def _verify_timm_hybrid(path: str, model_name: str,
                        tol: float = 1e-4) -> Dict:
    """Convert a timm hybrid state_dict and compare logits against the
    torch oracle hybrid."""
    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    from ..models.resnetv2 import HybridViT
    from . import torch_convert as tc

    sd_t = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: tc._t(v) for k, v in sd_t.items()}
    small = "r26" in model_name or "small" in model_name
    layers = (2, 2, 2, 2) if small else (3, 4, 9)
    embed, heads = (384, 6) if small else (768, 12)
    ncls = sd["head.weight"].shape[0] if "head.weight" in sd else 1000
    model = HybridViT(layers=layers, embed_dim=embed, depth=12,
                      num_heads=heads, num_classes=ncls)

    class _Shim:          # convert_timm_hybrid reads model.hybrid
        hybrid = model

    params = tc.to_jax(tc.convert_timm_hybrid(
        {k: torch.as_tensor(v) for k, v in sd.items()}, _Shim))["model"]
    to = _oracle_module()
    om = to.OracleTimmHybridViT(layers=layers, embed_dim=embed, depth=12,
                                num_heads=heads, num_classes=ncls)
    om.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items()},
                       strict=False)
    om.eval()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        ref = om(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(jax.jit(lambda p, v: model.apply(p, v))(
        params, jnp.asarray(x)), np.float32)
    diff = float(np.abs(got - ref).max())
    return {"path": path, "model": model_name, "max_abs_diff": diff,
            "tol": tol, "pass": diff <= tol}
