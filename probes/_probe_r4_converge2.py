"""Convergence probe #2: the release family at FULL size.

Phase A: apply_fc_norm=True (the opt-in Q7 fix), bf16, warm-started trunk
         — expect convergence; save params; int8-vs-bf16 eval on the
         CONVERGED weights (VERDICT r3 weak #4 done right).
Phase B: the bit-faithful config (Q7 discard) in f32 at a higher lr with
         a longer horizon — documents whether the faithful config can
         learn at all on a realistic budget, or whether the micro-CLS
         pathology is horizon-scale (the honest account for docs).

Reuses /tmp/r4_converge/trunk_tint.torch from _probe_r4_converge.py.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np             # noqa: E402
import jax                     # noqa: E402
import jax.numpy as jnp        # noqa: E402

import duoformer_tcga_tpu as dft                          # noqa: E402
from duoformer_tcga_tpu import train as train_lib         # noqa: E402
from duoformer_tcga_tpu.data import pipeline as dl        # noqa: E402
from duoformer_tcga_tpu.utils import metrics as metrics_lib  # noqa: E402

OUT = "/tmp/r4_converge"
TRUNK = f"{OUT}/trunk_tint.torch"
curve = {}


def batches(batch, seed, n=None):
    for i, raw in zip(range(n or 10 ** 9),
                      dl.synthetic_tiles(batch, 2, seed=seed,
                                         learnable=True)):
        yield raw


def train_cfg(name, model, batch, steps, lr, dtype, eval_every=25,
              schedule="onecycle"):
    sched = (train_lib.onecycle_schedule(lr, steps) if schedule == "onecycle"
             else lambda i: lr)
    opt = train_lib.make_optimizer(
        sched, weight_decay=1e-4,
        frozen_label_fn=train_lib.backbone_frozen_labels)
    state = train_lib.init_train_state(model, jax.random.PRNGKey(2), opt)
    state["params"] = train_lib.warm_start_params(
        model, state["params"], init_backbone=TRUNK)
    plan = train_lib.plan_train_memory(model, batch)
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
            x = dl.preprocess_tiles(xi, dtype=dtype)
            c += int((np.asarray(fwd(params, x)).argmax(-1) == y).sum())
            n += len(y)
        return c / n

    rng = jax.random.PRNGKey(3)
    t0 = time.time()
    best = 0.0
    curve[name] = []
    for i, raw in enumerate(batches(batch, seed=11, n=steps)):
        b = {"image": dl.preprocess_tiles(jnp.asarray(raw["image"]),
                                          dtype=dtype),
             "label": jnp.asarray(raw["label"])}
        state, m = step(state, b, rng)
        if (i + 1) % eval_every == 0 or i == steps - 1:
            acc = eacc(state["params"])
            best = max(best, acc)
            curve[name].append({"step": i + 1, "loss": float(m["loss"]),
                                "eval_acc": acc,
                                "t": round(time.time() - t0, 1)})
            print(f"[{name} {i + 1}] loss={float(m['loss']):.4f} "
                  f"eval_acc={acc:.3f} ({time.time() - t0:.0f}s)",
                  flush=True)
            if acc >= 0.95:
                print(f"[{name}] converged at step {i + 1}", flush=True)
                break
    print(f"[{name}] BEST eval acc {best:.3f} "
          f"(gate 0.75: {'PASS' if best >= 0.75 else 'FAIL'})", flush=True)
    return state, best


def eval_model(model, params, quantize=False):
    from duoformer_tcga_tpu.inference import Predictor
    pred = Predictor(model, params, dtype=jnp.bfloat16, quantize=quantize)
    cs = ns = 0
    probs_all, labels_all = [], []
    for raw in batches(64, seed=777, n=4):
        logits = np.asarray(pred(raw["image"]), np.float32)
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        probs_all.append(p)
        labels_all.append(raw["label"])
        cs += int((logits.argmax(-1) == raw["label"]).sum())
        ns += len(raw["label"])
    ece = metrics_lib.expected_calibration_error(
        np.concatenate(probs_all), np.concatenate(labels_all))
    return cs / ns, ece


def main():
    assert os.path.exists(TRUNK), "run _probe_r4_converge.py first"

    # Phase A: fc_norm fix, bf16
    rel = dft.build_model_no_extra_params(
        num_classes=2, num_layers=2, embed_dim=768, proj_dim=768,
        num_heads=12, depth=12, apply_fc_norm=True, dtype=jnp.bfloat16)
    state, best_a = train_cfg("release+fcnorm", rel, 256, 600, 3e-4,
                              jnp.bfloat16)
    params_f32 = jax.tree.map(lambda a: np.asarray(a, np.float32),
                              jax.device_get(state["params"]))
    from duoformer_tcga_tpu.utils.checkpoint import save_params_npz
    save_params_npz(f"{OUT}/release_fcnorm_params.npz", params_f32)
    acc_bf16, ece_bf16 = eval_model(rel, params_f32)
    acc_int8, ece_int8 = eval_model(rel, params_f32, quantize=True)
    print(f"[int8-converged] bf16 acc={acc_bf16:.4f} ece={ece_bf16:.4f} | "
          f"int8 acc={acc_int8:.4f} ece={ece_int8:.4f} | "
          f"delta acc={abs(acc_bf16 - acc_int8):.4f} "
          f"delta ece={abs(ece_bf16 - ece_int8):.4f}", flush=True)
    curve["int8_converged"] = {
        "bf16_acc": acc_bf16, "bf16_ece": ece_bf16,
        "int8_acc": acc_int8, "int8_ece": ece_int8}

    # Phase B: faithful Q7 config, f32, constant higher lr, longer horizon
    faith = dft.build_model_no_extra_params(
        num_classes=2, num_layers=2, embed_dim=768, proj_dim=768,
        num_heads=12, depth=12, dtype=jnp.float32)
    _, best_b = train_cfg("release-faithful-f32", faith, 128, 1500, 1e-3,
                          jnp.float32, eval_every=100, schedule="constant")

    with open(f"{OUT}/curve2.json", "w") as f:
        json.dump(curve, f, indent=1)
    print(f"DONE fcnorm_best={best_a:.3f} faithful_f32_best={best_b:.3f}",
          flush=True)


if __name__ == "__main__":
    main()
