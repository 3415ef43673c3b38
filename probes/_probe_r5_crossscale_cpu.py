"""Cross-scale XOR task, reduced size on CPU — calibration for the slow
test in tests/test_cross_scale.py:

  1. pretrain a GENERIC trunk on the tint task (no bar/stripe attribute
     detectors — measured on chip, any attribute-pretrained trunk leaks
     the attributes' product into pooled features via deep-layer
     interactions);
  2. linear probe: FROZEN generic trunk + fresh fc on the XOR task,
     trained to plateau -> expect ~chance;
  3. DuoFormerLegacy (reduced 96/depth2) warm-started with the SAME
     trunk -> expect >= 0.75 (measured full-size on chip: legacy
     learns XOR; the release family's residual-free patch chain does
     not — see docs/performance.md round 5).

Run on the 1-core CPU host: python probes/_probe_r5_crossscale_cpu.py
"""

import os
import sys
import time

os.environ.setdefault("DUOFORMER_FUSED_ATTN", "0")
os.environ.setdefault("DUOFORMER_MEGAFUSE", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np             # noqa: E402
import jax                     # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])

import jax.numpy as jnp        # noqa: E402

import duoformer_tcga_tpu as dft                          # noqa: E402
from duoformer_tcga_tpu import train as train_lib         # noqa: E402
from duoformer_tcga_tpu.data import pipeline as dl        # noqa: E402
from duoformer_tcga_tpu.models.resnet import ResNet50withFC  # noqa: E402

t0 = time.time()


def log(msg):
    print(f"[{time.time() - t0:7.0f}s] {msg}", flush=True)


def cs_batches(batch, seed, n, mode="task"):
    return zip(range(n), dl.synthetic_cross_scale(batch, seed=seed,
                                                  mode=mode))


def prep(raw):
    return {"image": dl.preprocess_tiles(jnp.asarray(raw["image"]),
                                         dtype=jnp.float32),
            "label": jnp.asarray(raw["label"])}


def pretrain_tint_trunk(steps=40, batch=8):
    """Generic trunk: the tint task (same recipe as the committed
    test_convergence fixture)."""
    probe = ResNet50withFC(num_classes=2, dtype=jnp.float32)

    class M:
        @staticmethod
        def apply(params, x, rng=None, train=False, bn_stats=None):
            return probe.apply(params, x, rng=rng, train=train,
                               freeze=False, bn_stats=bn_stats)

    opt = train_lib.make_optimizer(train_lib.onecycle_schedule(1e-3, steps))
    state = train_lib.init_train_state(probe, jax.random.PRNGKey(0), opt)
    step = train_lib.make_train_step(M, opt, donate=False, bn_stats=True)
    rng = jax.random.PRNGKey(1)
    for i, raw in zip(range(steps),
                      dl.synthetic_tiles(batch, 2, seed=0,
                                         learnable=True)):
        state, m = step(state, prep(raw), rng)
    log(f"tint pretrain done: final acc={float(m['accuracy']):.3f}")
    return state["params"]["trunk"]


def eval_acc(fwd, params, seed=777, n=4, batch=32):
    c = t = 0
    for _, raw in cs_batches(batch, seed, n):
        b = prep(raw)
        c += int((np.asarray(fwd(params, b["image"])).argmax(-1)
                  == np.asarray(b["label"])).sum())
        t += len(raw["label"])
    return c / t


def linear_probe(trunk, steps=300, batch=16):
    probe = ResNet50withFC(num_classes=2, dtype=jnp.float32)

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
    tr = []
    best = 0.0
    for i, raw in cs_batches(batch, 11, steps):
        state, m = step(state, prep(raw), rng)
        tr.append(float(m["accuracy"]))
        if (i + 1) % 50 == 0:
            ea = eval_acc(fwd, state["params"])
            best = max(best, ea)
            log(f"probe {i + 1}: train(last50)={np.mean(tr[-50:]):.3f} "
                f"eval={ea:.3f}")
    log(f"probe done: BEST eval={best:.3f}")
    return best


def duoformer_legacy(trunk_path, steps=600, batch=8):
    model = dft.build_model(num_classes=2, embed_dim=96, proj_dim=96,
                            depth=2, pretrained=False, dtype=jnp.float32)
    opt = train_lib.make_optimizer(
        train_lib.onecycle_schedule(1e-3, steps),
        frozen_label_fn=train_lib.backbone_frozen_labels)
    state = train_lib.init_train_state(model, jax.random.PRNGKey(4), opt)
    state["params"] = train_lib.warm_start_params(
        model, state["params"], init_backbone=trunk_path)
    step = train_lib.make_train_step(
        model, opt, donate=False,
        frozen_label_fn=train_lib.backbone_frozen_labels)
    fwd = jax.jit(lambda p, x: model.apply(p, x, train=False))
    rng = jax.random.PRNGKey(5)
    best = 0.0
    accs = []
    for i, raw in cs_batches(batch, 21, steps):
        state, m = step(state, prep(raw), rng)
        accs.append(float(m["accuracy"]))
        if (i + 1) % 50 == 0:
            ea = eval_acc(fwd, state["params"])
            best = max(best, ea)
            log(f"legacy {i + 1}: loss={float(m['loss']):.4f} "
                f"train(last50)={np.mean(accs[-50:]):.3f} eval={ea:.3f}")
            if best >= 0.95:
                break
    log(f"legacy done: BEST eval={best:.3f}")
    return best


def main():
    import torch
    from duoformer_tcga_tpu.utils import torch_convert as tc

    trunk = pretrain_tint_trunk()
    tr32 = jax.tree.map(lambda a: np.asarray(a, np.float32),
                        jax.device_get(trunk))
    trunk_path = "/tmp/r5_cs_tint_trunk.torch"
    torch.save(tc.resnet_to_torch_state_dict(tr32, 50), trunk_path)
    probe_best = linear_probe(trunk)
    duo_best = duoformer_legacy(trunk_path)
    log(f"RESULT probe={probe_best:.3f} legacy={duo_best:.3f} "
        f"(want probe<=0.6, legacy>=0.75)")


if __name__ == "__main__":
    main()
