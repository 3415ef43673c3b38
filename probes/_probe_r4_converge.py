"""Full-size flagship convergence on the real chip (VERDICT r3 missing #1
+ weak #4): warm-started DuoFormer (768/12/12, both families) fine-tuned
to the reference's own >=0.75 eval-accuracy gate (main_toy.py:138) on the
learnable tint task, then (release family) int8-vs-bf16 eval on the
TRAINED weights.

Phases (one process, one chip claim):
  1. pretrain ResNet-50 trunk on tint (unfrozen, batch-stat BN +
     running-stat threading), export -> torch state_dict (the
     init_backbone converter format)
  2. warm-start flagship release DuoFormer, train frozen-trunk B=256
     until eval >= 0.95 or 600 steps; log the learning curve
  3. same for DuoFormerLegacy at its reference hyperparams
     (attn_drop 0.1 + LayerScale, reg megakernels), B=128
  4. int8: quantize the trained release params, eval bf16 vs int8
     accuracy + ECE on the held-out tint set

Artifacts: /tmp/r4_converge/{trunk_tint.torch, release_params.npz,
curve.json}
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
from duoformer_tcga_tpu.models.resnet import ResNet50withFC  # noqa: E402
from duoformer_tcga_tpu.utils import torch_convert as tc  # noqa: E402
from duoformer_tcga_tpu.utils import metrics as metrics_lib  # noqa: E402

OUT = "/tmp/r4_converge"
os.makedirs(OUT, exist_ok=True)
curve = {"release": [], "legacy": []}


def batches(batch, seed, n=None):
    for i, raw in zip(range(n or 10**9),
                      dl.synthetic_tiles(batch, 2, seed=seed,
                                         learnable=True)):
        yield raw


def pretrain_trunk(steps=60, batch=64):
    probe = ResNet50withFC(num_classes=2, dtype=jnp.bfloat16)

    class M:
        @staticmethod
        def apply(params, x, rng=None, train=False, bn_stats=None):
            return probe.apply(params, x, rng=rng, train=train,
                               freeze=False, bn_stats=bn_stats)

    opt = train_lib.make_optimizer(train_lib.onecycle_schedule(1e-3, steps))
    state = train_lib.init_train_state(probe, jax.random.PRNGKey(0), opt)
    step = train_lib.make_train_step(M, opt, donate=False, bn_stats=True)
    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    for i, raw in enumerate(batches(batch, seed=0, n=steps)):
        b = {"image": dl.preprocess_tiles(jnp.asarray(raw["image"]),
                                          dtype=jnp.bfloat16),
             "label": jnp.asarray(raw["label"])}
        state, m = step(state, b, rng)
    print(f"[pretrain] {steps} steps loss={float(m['loss']):.4f} "
          f"acc={float(m['accuracy']):.2f} ({time.time() - t0:.0f}s)",
          flush=True)
    import torch
    trunk = jax.tree.map(lambda a: np.asarray(a, np.float32),
                         jax.device_get(state["params"]["trunk"]))
    sd = tc.resnet_to_torch_state_dict(trunk, 50)
    torch.save(sd, f"{OUT}/trunk_tint.torch")
    return f"{OUT}/trunk_tint.torch"


def eval_model(model, params, n_batches=4, batch=64, quantize=False):
    from duoformer_tcga_tpu.inference import Predictor
    pred = Predictor(model, params, dtype=jnp.bfloat16, quantize=quantize)
    cs = ns = 0
    probs_all, labels_all = [], []
    for raw in batches(batch, seed=777, n=n_batches):
        logits = np.asarray(pred(raw["image"]), np.float32)
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        probs_all.append(p)
        labels_all.append(raw["label"])
        cs += int((logits.argmax(-1) == raw["label"]).sum())
        ns += len(raw["label"])
    probs = np.concatenate(probs_all)
    labels = np.concatenate(labels_all)
    ece = metrics_lib.expected_calibration_error(probs, labels)
    return cs / ns, ece


def train_family(name, model, batch, steps, lr, eval_every=25):
    opt = train_lib.make_optimizer(
        train_lib.onecycle_schedule(lr, steps),
        frozen_label_fn=train_lib.backbone_frozen_labels)
    state = train_lib.init_train_state(model, jax.random.PRNGKey(2), opt)
    state["params"] = train_lib.warm_start_params(
        model, state["params"], init_backbone=f"{OUT}/trunk_tint.torch")
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
            x = dl.preprocess_tiles(xi, dtype=jnp.bfloat16)
            c += int((np.asarray(fwd(params, x)).argmax(-1) == y).sum())
            n += len(y)
        return c / n

    rng = jax.random.PRNGKey(3)
    t0 = time.time()
    best = 0.0
    for i, raw in enumerate(batches(batch, seed=11, n=steps)):
        b = {"image": dl.preprocess_tiles(jnp.asarray(raw["image"]),
                                          dtype=jnp.bfloat16),
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
          f"(reference gate 0.75: {'PASS' if best >= 0.75 else 'FAIL'})",
          flush=True)
    return state, best


def main():
    pretrain_trunk()

    release = dft.build_model_no_extra_params(
        num_classes=2, num_layers=2, embed_dim=768, proj_dim=768,
        num_heads=12, depth=12, dtype=jnp.bfloat16)
    state, best_r = train_family("release", release, batch=256, steps=600,
                                 lr=3e-4)
    params_f32 = jax.tree.map(lambda a: np.asarray(a, np.float32),
                              jax.device_get(state["params"]))
    from duoformer_tcga_tpu.utils.checkpoint import save_params_npz
    save_params_npz(f"{OUT}/release_params.npz", params_f32)

    # int8 vs bf16 on the TRAINED weights (VERDICT r3 weak #4)
    acc_bf16, ece_bf16 = eval_model(release, params_f32)
    acc_int8, ece_int8 = eval_model(release, params_f32, quantize=True)
    print(f"[int8] bf16 acc={acc_bf16:.4f} ece={ece_bf16:.4f} | "
          f"int8 acc={acc_int8:.4f} ece={ece_int8:.4f} | "
          f"delta acc={abs(acc_bf16 - acc_int8):.4f}", flush=True)
    curve["int8"] = {"bf16_acc": acc_bf16, "bf16_ece": ece_bf16,
                     "int8_acc": acc_int8, "int8_ece": ece_int8}

    legacy = dft.build_model(
        num_classes=2, embed_dim=768, proj_dim=768, depth=12,
        pretrained=False, dtype=jnp.bfloat16)
    _, best_l = train_family("legacy", legacy, batch=128, steps=600,
                             lr=3e-4)

    with open(f"{OUT}/curve.json", "w") as f:
        json.dump(curve, f, indent=1)
    print(f"DONE release_best={best_r:.3f} legacy_best={best_l:.3f}",
          flush=True)


if __name__ == "__main__":
    main()
