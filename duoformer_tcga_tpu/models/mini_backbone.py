"""Hand-written reduced trunks (inventory parity with the reference's
backbone.py).

The reference defines two from-scratch mini ResNet-ish trunks — `Backbone`
(3 single-bottleneck stages -> (x1,x2,x3) at 28/14/7 grid,
/root/reference/models/backbone.py:17-176) and `Backbone2` (2 stages ->
(x1,x2), backbone.py:178-285) — referenced only from commented-out code
paths. One parametric implementation covers both. The reference's
import-time `CUDA_VISIBLE_DEVICES` side effect (backbone.py:13-14, quirk
Q11) is deliberately NOT reproduced.

Stage spec (all single bottlenecks, stride-2 on the 3x3 conv and the
downsample): 64->(128)->512, 512->(256)->1024, 1024->(512)->2048.
Init: conv kaiming_normal(fan_out, relu), BN ones/zeros
(backbone.py:164-175) — the same schemes as ResNetBackbone.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import nn
from .resnet import _bottleneck_apply, _bottleneck_init, _conv_init

_STAGES = [(64, 128, 512), (512, 256, 1024), (1024, 512, 2048)]


class MiniBackbone:
    """num_stages=3 -> reference `Backbone`; 2 -> `Backbone2`."""

    def __init__(self, num_stages: int = 3, dtype=jnp.float32):
        assert num_stages in (2, 3)
        self.num_stages = num_stages
        self.dtype = dtype

    def init(self, key):
        kstem, *ks = jax.random.split(key, 1 + self.num_stages)
        p = {
            "conv1": _conv_init(kstem, 7, 7, 3, 64, self.dtype),
            "bn1": nn.batchnorm_init(64, self.dtype),
        }
        for i, (cin, width, cout) in enumerate(_STAGES[:self.num_stages]):
            p[f"stage{i + 1}"] = _bottleneck_init(ks[i], cin, width, cout,
                                                  stride=2, dtype=self.dtype)
        return p

    def apply(self, params, x, train=False):
        """x: [B, 224, 224, 3] -> tuple of stage outputs (28^2, 14^2[, 7^2])."""
        y = nn.conv2d(params["conv1"], x, 2, 3)
        y = nn.relu(nn.batchnorm(params["bn1"], y, train=train))
        y = nn.maxpool2d(y, window=3, stride=2, padding=1)
        outs = []
        for i in range(self.num_stages):
            y = _bottleneck_apply(params[f"stage{i + 1}"], y, stride=2,
                                  train=train)
            outs.append(y)
        return tuple(outs)
