"""Cross-scale co-location task at FULL SIZE on the real chip
(VERDICT r4 next #1, second half): pretrain the shared trunk on the
no-co-location pretrain task, measure the pooled linear probe's ceiling,
then train DuoFormer (release+fc_norm and legacy) 768/12/12 warm-started
from the SAME trunk to the reference's 0.75 gate. Curves land in
/tmp/r5_crossscale/curve.json for docs/convergence_r5.json.

Run ALONE (claims the chip): python probes/_probe_r5_crossscale_tpu.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np             # noqa: E402
import jax                     # noqa: E402
import jax.numpy as jnp        # noqa: E402

import duoformer_tcga_tpu as dft                    # noqa: E402
from duoformer_tcga_tpu import train as train_lib   # noqa: E402
from duoformer_tcga_tpu.data import pipeline as dl  # noqa: E402
from duoformer_tcga_tpu.models.resnet import ResNet50withFC  # noqa: E402

OUT = "/tmp/r5_crossscale"
os.makedirs(OUT, exist_ok=True)
t0 = time.time()
CURVES = {}


def log(msg):
    print(f"[{time.time() - t0:7.0f}s] {msg}", flush=True)


def batches(batch, seed, n, mode="task"):
    return zip(range(n), dl.synthetic_cross_scale(batch, seed=seed,
                                                  mode=mode))


def prep(raw):
    return {"image": dl.preprocess_tiles(jnp.asarray(raw["image"]),
                                         dtype=jnp.bfloat16),
            "label": jnp.asarray(raw["label"])}


EV = None


def eval_acc(fwd, params):
    global EV
    if EV is None:
        EV = [(jnp.asarray(r["image"]), r["label"])
              for _, r in batches(64, 777, 4)]
    c = t = 0
    for xi, y in EV:
        x = dl.preprocess_tiles(xi, dtype=jnp.bfloat16)
        c += int((np.asarray(fwd(params, x)).argmax(-1) == y).sum())
        t += len(y)
    return c / t


def pretrain_trunk(steps=200, batch=64):
    probe = ResNet50withFC(num_classes=4, dtype=jnp.bfloat16)

    class M:
        @staticmethod
        def apply(params, x, rng=None, train=False, bn_stats=None):
            return probe.apply(params, x, rng=rng, train=train,
                               freeze=False, bn_stats=bn_stats)

    opt = train_lib.make_optimizer(train_lib.onecycle_schedule(1e-3, steps))
    state = train_lib.init_train_state(probe, jax.random.PRNGKey(0), opt)
    step = train_lib.make_train_step(M, opt, donate=False, bn_stats=True)
    rng = jax.random.PRNGKey(1)
    accs = []
    for i, raw in batches(batch, 0, steps, "pretrain"):
        state, m = step(state, prep(raw), rng)
        accs.append(float(m["accuracy"]))
        if (i + 1) % 25 == 0:
            log(f"pretrain {i + 1}: acc(last25)={np.mean(accs[-25:]):.3f}")
    CURVES["pretrain_acc"] = accs
    import torch
    from duoformer_tcga_tpu.utils import torch_convert as tc
    trunk = jax.tree.map(lambda a: np.asarray(a, np.float32),
                         jax.device_get(state["params"]["trunk"]))
    path = os.path.join(OUT, "trunk_crossscale.torch")
    torch.save(tc.resnet_to_torch_state_dict(trunk, 50), path)
    return path, state["params"]["trunk"]


def linear_probe(trunk, steps=400, batch=64):
    probe = ResNet50withFC(num_classes=2, dtype=jnp.bfloat16)

    def apply(params, x, rng=None, train=False):
        return probe.apply(params, x, train=train, freeze=True,
                           bn_batch_stats=True)

    model_like = type("M", (), {"apply": staticmethod(apply)})()
    opt = train_lib.make_optimizer(
        train_lib.onecycle_schedule(1e-2, steps), weight_decay=1e-4,
        frozen_label_fn=lambda p: {
            "trunk": jax.tree.map(lambda _: "frozen", p["trunk"]),
            "fc": jax.tree.map(lambda _: "train", p["fc"]),
        })
    state = train_lib.init_train_state(probe, jax.random.PRNGKey(2), opt)
    state["params"]["trunk"] = trunk
    step = train_lib.make_train_step(model_like, opt, donate=False)
    fwd = jax.jit(lambda p, x: apply(p, x))
    rng = jax.random.PRNGKey(3)
    best = 0.0
    curve = []
    for i, raw in batches(batch, 11, steps):
        state, m = step(state, prep(raw), rng)
        if (i + 1) % 50 == 0:
            ea = eval_acc(fwd, state["params"])
            best = max(best, ea)
            curve.append([i + 1, ea])
            log(f"probe {i + 1}: eval={ea:.3f}")
    CURVES["linear_probe_eval"] = curve
    log(f"probe done: BEST eval={best:.3f}")
    return best


def duoformer(trunk_path, family, steps=400, batch=128):
    if family == "release_fcnorm":
        model = dft.build_model_no_extra_params(
            num_classes=2, num_layers=2, embed_dim=768, proj_dim=768,
            num_heads=12, depth=12, apply_fc_norm=True,
            dtype=jnp.bfloat16)
        lr = 3e-4
    else:
        model = dft.build_model(num_classes=2, embed_dim=768,
                                proj_dim=768, depth=12, pretrained=False,
                                dtype=jnp.bfloat16)
        lr = 3e-4
    opt = train_lib.make_optimizer(
        train_lib.onecycle_schedule(lr, steps),
        frozen_label_fn=train_lib.backbone_frozen_labels)
    state = train_lib.init_train_state(model, jax.random.PRNGKey(4), opt)
    state["params"] = train_lib.warm_start_params(
        model, state["params"], init_backbone=trunk_path)
    plan = train_lib.plan_train_memory(model, batch)
    step = train_lib.make_train_step(
        model, opt, donate=False,
        frozen_label_fn=train_lib.backbone_frozen_labels,
        accum_steps=plan["accum_steps"])
    fwd = jax.jit(lambda p, x: model.apply(p, x, train=False))
    rng = jax.random.PRNGKey(5)
    best = 0.0
    curve = []
    for i, raw in batches(batch, 21, steps):
        state, m = step(state, prep(raw), rng)
        if (i + 1) % 25 == 0:
            ea = eval_acc(fwd, state["params"])
            best = max(best, ea)
            curve.append([i + 1, ea])
            log(f"{family} {i + 1}: loss={float(m['loss']):.4f} "
                f"eval={ea:.3f}")
            if best >= 0.95:
                break
    CURVES[f"{family}_eval"] = curve
    log(f"{family} done: BEST eval={best:.3f} "
        f"(gate 0.75: {'PASS' if best >= 0.75 else 'FAIL'})")
    return best


def main():
    trunk_path, trunk = pretrain_trunk()
    probe_best = linear_probe(trunk)
    rel = duoformer(trunk_path, "release_fcnorm")
    leg = duoformer(trunk_path, "legacy")
    with open(os.path.join(OUT, "curve.json"), "w") as f:
        json.dump({"task": "cross_scale", "full_size": "768/12/12",
                   "probe_best": probe_best, "release_fcnorm_best": rel,
                   "legacy_best": leg, "curves": CURVES}, f, indent=1)
    log(f"RESULT probe={probe_best:.3f} release+fc_norm={rel:.3f} "
        f"legacy={leg:.3f} (want probe<=0.6, duoformer>=0.75)")


if __name__ == "__main__":
    main()
