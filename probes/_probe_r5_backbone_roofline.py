"""Per-stage roofline of the frozen (BN-folded) ResNet-50 backbone
forward at B=256 bf16 — closing the last forward bucket without a
per-item verdict (VERDICT r4 weak #1 / next #7).

Measures jit-chained prefixes (stem; +layer1; ...; +layer4) in ONE
process, differences them into per-stage times, and compares each stage
against its analytic FLOP bound (197 TFLOP/s v5e bf16) and HBM bound
(819 GB/s, counting each conv's input read + output write at bf16 —
i.e. assuming perfect BN/relu/add fusion, which XLA does here).

Run ALONE (claims the chip): python probes/_probe_r5_backbone_roofline.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np             # noqa: E402
import jax                     # noqa: E402
import jax.numpy as jnp        # noqa: E402

from duoformer_tcga_tpu.models.resnet import (   # noqa: E402
    ResNetBackbone, fold_bn, _bottleneck_apply, _bn_or_affine)
from duoformer_tcga_tpu.ops import nn            # noqa: E402

B = 256
ITERS = 30
PEAK_TFLOPS = 197.0
PEAK_HBM = 819e9


def stage_costs():
    """[(name, flops, hbm_bytes)] per stage at B=256 bf16, assuming
    perfect elementwise fusion (each conv: read in, write out)."""
    out = []

    def conv(hin, win, cin, hout, wout, cout, kh, kw):
        fl = 2 * B * hout * wout * kh * kw * cin * cout
        by = 2 * B * (hin * win * cin + hout * wout * cout) \
            + 2 * kh * kw * cin * cout
        return fl, by

    # stem: 7x7/2 conv (224->112) + maxpool (112->56)
    fl, by = conv(224, 224, 3, 112, 112, 64, 7, 7)
    mp = 2 * B * (112 * 112 * 64 + 56 * 56 * 64)   # maxpool traffic
    out.append(("stem", fl, by + mp))
    spatial = [56, 28, 14, 7]
    widths = [64, 128, 256, 512]
    couts = [256, 512, 1024, 2048]
    nblocks = [3, 4, 6, 3]
    cin = 64
    for si in range(4):
        s, w, co, nb = spatial[si], widths[si], couts[si], nblocks[si]
        sin = 56 if si == 0 else spatial[si - 1]
        fl = by = 0
        for bi in range(nb):
            if bi == 0:
                # conv1 1x1 at input spatial, conv2 3x3 strides down
                f1, b1 = conv(sin, sin, cin, sin, sin, w, 1, 1)
                f2, b2 = conv(sin, sin, w, s, s, w, 3, 3)
                fd, bd = conv(sin, sin, cin, s, s, co, 1, 1)
                fl += f1 + f2 + fd
                by += b1 + b2 + bd
            else:
                f1, b1 = conv(s, s, co, s, s, w, 1, 1)
                f2, b2 = conv(s, s, w, s, s, w, 3, 3)
                fl += f1 + f2
                by += b1 + b2
            f3, b3 = conv(s, s, w, s, s, co, 1, 1)
            fl += f3
            by += b3 + 2 * B * s * s * co          # residual-add read
            cin = co
        out.append((f"layer{si + 1}", fl, by))
    return out


def make_prefix(model, n_stages):
    """Jittable: run stem + first n_stages stages, chained n times
    (np.asarray fetch proves completion — the axon block_until_ready
    does not, probes/README.md)."""

    def prefix(params, x, n):
        def body(i, carry):
            x, acc = carry
            xi = x + (i.astype(x.dtype) * 0)
            y = nn.conv2d(params["conv1"], xi, 2, 3)
            y = nn.relu(_bn_or_affine(params["bn1"], y))
            y = nn.maxpool2d(y, window=3, stride=2, padding=1)
            for si in range(n_stages):
                for bi, blk in enumerate(params[f"layer{si + 1}"]):
                    stride = 2 if (si > 0 and bi == 0) else 1
                    y = _bottleneck_apply(blk, y, stride)
            return (x, acc + jnp.sum(y.astype(jnp.float32)))

        _, acc = jax.lax.fori_loop(0, n, body,
                                   (x, jnp.zeros((), jnp.float32)))
        return acc

    return jax.jit(prefix)


def main():
    model = ResNetBackbone(50, jnp.bfloat16)
    params = fold_bn(model.init(jax.random.PRNGKey(0)))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 224, 224, 3),
                          jnp.bfloat16)
    params, x = jax.device_put((params, x))

    times = []
    for n in range(5):
        fn = make_prefix(model, n)
        _ = np.asarray(fn(params, x, 2))         # compile + warm
        t1 = time.perf_counter()
        _ = np.asarray(fn(params, x, 1))
        t1 = time.perf_counter() - t1
        tN = time.perf_counter()
        _ = np.asarray(fn(params, x, ITERS + 1))
        tN = time.perf_counter() - tN
        dt = (tN - t1) / ITERS * 1e3
        times.append(dt)
        print(f"prefix stem+{n} stages: {dt:.2f} ms", flush=True)

    costs = stage_costs()
    print(f"\n{'stage':8} {'meas ms':>8} {'flop ms':>8} {'hbm ms':>8} "
          f"{'bound':>8} {'gap':>6}", flush=True)
    prev = 0.0
    tot_m = tot_b = 0.0
    for i, (name, fl, by) in enumerate(costs):
        meas = times[i] - prev if i else times[0]
        prev = times[i]
        fms = fl / (PEAK_TFLOPS * 1e12) * 1e3
        hms = by / PEAK_HBM * 1e3
        bound = max(fms, hms)
        tot_m += meas
        tot_b += bound
        print(f"{name:8} {meas:8.2f} {fms:8.2f} {hms:8.2f} {bound:8.2f} "
              f"{meas / bound:5.1f}x", flush=True)
    print(f"{'total':8} {tot_m:8.2f} {'':8} {'':8} {tot_b:8.2f} "
          f"{tot_m / tot_b:5.1f}x", flush=True)


if __name__ == "__main__":
    main()
