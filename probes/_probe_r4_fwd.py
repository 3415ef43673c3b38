"""Forward A/B (round 4): space-to-depth stem on the full flagship
forward, one process, chained-jit methodology. Also isolates the
backbone-only forward cost under both stems to attribute any delta."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np             # noqa: E402
import jax                     # noqa: E402
import jax.numpy as jnp        # noqa: E402

import duoformer_tcga_tpu as dft                          # noqa: E402
from duoformer_tcga_tpu.models.duoformer import fold_for_inference  # noqa: E402
from duoformer_tcga_tpu.models.resnet import ResNetBackbone  # noqa: E402

BATCH = 256
ITERS = 20


def timeit(fn, *args):
    _ = np.asarray(fn(*args, 2))
    t1 = time.perf_counter()
    _ = np.asarray(fn(*args, 1))
    t1 = time.perf_counter() - t1
    tN = time.perf_counter()
    _ = np.asarray(fn(*args, ITERS + 1))
    tN = time.perf_counter() - tN
    return (tN - t1) / ITERS


def full_forward(env):
    prev = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        model = dft.build_model_no_extra_params(
            num_classes=2, num_layers=2, embed_dim=768, proj_dim=768,
            num_heads=12, depth=12, dtype=jnp.bfloat16)
        params = fold_for_inference(model.init(jax.random.PRNGKey(0)))
        x = jax.random.normal(jax.random.PRNGKey(1),
                              (BATCH, 224, 224, 3), jnp.bfloat16)

        def run_n(params, x, n):
            def body(i, acc):
                xi = x + (i.astype(x.dtype) * 0)
                return acc + model.apply(params, xi, train=False) \
                    .astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        dt = timeit(jax.jit(run_n), params, x)
        return dt
    finally:
        for k, v in prev.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def backbone_forward(env):
    prev = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        bb = ResNetBackbone(50, jnp.bfloat16)
        from duoformer_tcga_tpu.models.resnet import fold_bn
        params = fold_bn(bb.init(jax.random.PRNGKey(0)))
        x = jax.random.normal(jax.random.PRNGKey(1),
                              (BATCH, 224, 224, 3), jnp.bfloat16)

        def run_n(params, x, n):
            def body(i, acc):
                xi = x + (i.astype(x.dtype) * 0)
                f = bb.apply(params, xi)
                return acc + sum(v.astype(jnp.float32).sum()
                                 for v in f.values())
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return timeit(jax.jit(run_n), params, x)
    finally:
        for k, v in prev.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


if __name__ == "__main__":
    for label, env in (("stem=conv7", {"DUOFORMER_S2D_STEM": "0"}),
                       ("stem=s2d", {"DUOFORMER_S2D_STEM": "1"})):
        dt = backbone_forward(env)
        print(f"[backbone {label}] {dt * 1e3:.2f} ms = "
              f"{BATCH / dt:.1f} tiles/s", flush=True)
    for label, env in (("stem=conv7", {"DUOFORMER_S2D_STEM": "0"}),
                       ("stem=s2d", {"DUOFORMER_S2D_STEM": "1"})):
        dt = full_forward(env)
        print(f"[full fwd {label}] {dt * 1e3:.2f} ms = "
              f"{BATCH / dt:.1f} tiles/s", flush=True)
