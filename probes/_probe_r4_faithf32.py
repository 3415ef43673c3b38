"""Faithful-config (Q7 discard) full-size release DuoFormer, f32, longer
horizon — standalone phase B of _probe_r4_converge2.py. The fused Pallas
kernels are VMEM-tuned for bf16 (f32 MLP tile = 18MB > 16MB scoped), so
this runs the XLA attention path end to end."""

import os
import sys
import time

os.environ["DUOFORMER_FUSED_ATTN"] = "0"
os.environ["DUOFORMER_MEGAFUSE"] = "0"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np             # noqa: E402
import jax                     # noqa: E402
import jax.numpy as jnp        # noqa: E402

import duoformer_tcga_tpu as dft                          # noqa: E402
from duoformer_tcga_tpu import train as train_lib         # noqa: E402
from duoformer_tcga_tpu.data import pipeline as dl        # noqa: E402

TRUNK = "/tmp/r4_converge/trunk_tint.torch"
STEPS = 1500
BATCH = 128


def batches(batch, seed, n=None):
    for i, raw in zip(range(n or 10 ** 9),
                      dl.synthetic_tiles(batch, 2, seed=seed,
                                         learnable=True)):
        yield raw


def main():
    model = dft.build_model_no_extra_params(
        num_classes=2, num_layers=2, embed_dim=768, proj_dim=768,
        num_heads=12, depth=12, dtype=jnp.float32)
    opt = train_lib.make_optimizer(
        lambda i: 1e-3, weight_decay=1e-4,
        frozen_label_fn=train_lib.backbone_frozen_labels)
    state = train_lib.init_train_state(model, jax.random.PRNGKey(2), opt)
    state["params"] = train_lib.warm_start_params(
        model, state["params"], init_backbone=TRUNK)
    plan = train_lib.plan_train_memory(model, BATCH)
    step = train_lib.make_train_step(
        model, opt, donate=False,
        frozen_label_fn=train_lib.backbone_frozen_labels,
        accum_steps=plan["accum_steps"])
    fwd = jax.jit(lambda p, x: model.apply(p, x, train=False))
    ev = [(jnp.asarray(r["image"]), r["label"])
          for r in batches(64, seed=777, n=4)]

    def eacc(params):
        c = n = 0
        for xi, y in ev:
            x = dl.preprocess_tiles(xi, dtype=jnp.float32)
            c += int((np.asarray(fwd(params, x)).argmax(-1) == y).sum())
            n += len(y)
        return c / n

    rng = jax.random.PRNGKey(3)
    t0 = time.time()
    best = 0.0
    for i, raw in enumerate(batches(BATCH, seed=11, n=STEPS)):
        b = {"image": dl.preprocess_tiles(jnp.asarray(raw["image"]),
                                          dtype=jnp.float32),
             "label": jnp.asarray(raw["label"])}
        state, m = step(state, b, rng)
        if (i + 1) % 100 == 0:
            acc = eacc(state["params"])
            best = max(best, acc)
            print(f"[faithful-f32 {i + 1}] loss={float(m['loss']):.4f} "
                  f"eval_acc={acc:.3f} ({time.time() - t0:.0f}s)",
                  flush=True)
            if acc >= 0.95:
                print("converged", flush=True)
                break
    print(f"[faithful-f32] BEST eval acc {best:.3f} "
          f"(gate 0.75: {'PASS' if best >= 0.75 else 'FAIL'})", flush=True)


if __name__ == "__main__":
    main()
