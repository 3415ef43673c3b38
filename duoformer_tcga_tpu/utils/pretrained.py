"""Pretrained-backbone registry & loading.

Mirrors the reference's SSL weight plumbing (get_pretrained_url /
resnet50FeatureExtractor, /root/reference/models/resnet50ssl.py:48-79):
the lunit-io benchmark-ssl-pathology release trunks (BT / MoCoV2 / SwAV,
ResNet-50, 200 epochs on TCGA+TULIP) plus torchvision ImageNet weights.

This environment has no network egress, so download is delegated: point
`load(key_or_path)` at a locally cached torch weight file (the same
`*.torch` files the reference caches, resnet50ssl.py:65-77) and it
converts to a JAX backbone tree. URLs are recorded for provenance and for
use in connected deployments.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

_URL_PREFIX = ("https://github.com/lunit-io/benchmark-ssl-pathology/"
               "releases/download/pretrained-weights")

# key -> (filename, url) — resnet50ssl.py:48-57
SSL_REGISTRY: Dict[str, str] = {
    "BT": "bt_rn50_ep200.torch",
    "MoCoV2": "mocov2_rn50_ep200.torch",
    "SwAV": "swav_rn50_ep200.torch",
}


def pretrained_url(key: str) -> str:
    return f"{_URL_PREFIX}/{SSL_REGISTRY[key]}"


def load_backbone(key_or_path: str, depth: int = 50,
                  cache_dir: Optional[str] = None):
    """Resolve an SSL registry key (via local cache) or a direct file path
    to a converted JAX backbone param tree. Raises with the download URL
    when the file is absent (no egress here)."""
    from . import torch_convert as tc

    if key_or_path in SSL_REGISTRY:
        fname = SSL_REGISTRY[key_or_path]
        path = os.path.join(cache_dir or ".", fname)
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"SSL weights '{key_or_path}' not cached at {path}; "
                f"download {pretrained_url(key_or_path)} in a connected "
                f"environment and place it there.")
    else:
        path = key_or_path

    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return tc.to_jax(tc.convert_resnet(sd, depth))
