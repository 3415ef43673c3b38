"""int8 TRAINING measured verdict (VERDICT r4 weak #5 / next #6).

The framework's a8w8 path has no backward kernels, so the natural
training variant is a straight-through estimator (QAT-style): the
forward runs the int8 megakernels on per-step-quantized weights, the
backward recomputes the bf16 forward and takes its VJP. Two questions,
both answered on the real chip in one process:

  A. throughput — int8-STE step vs an identically-structured bf16 step
     (flagship 768/12/12, frozen backbone, B=64 accum=1). Note the STE
     backward must recompute the bf16 forward, so the int8 step does
     int8-fwd + bf16-fwd + bf16-bwd vs bf16-fwd + bf16-bwd: the +9.4%
     int8 serving gain cannot cover a whole extra forward — expect a
     measured NEGATIVE; this probe pins the number.
  B. accuracy — does int8-STE training still clear the reference's 0.75
     eval gate on the tint task at full size (warm trunk from
     /tmp/r4_converge, B=128, 150 steps)?

Run ALONE (claims the chip): python probes/_probe_r5_int8train.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np             # noqa: E402
import jax                     # noqa: E402
import jax.numpy as jnp        # noqa: E402
import optax                   # noqa: E402

import duoformer_tcga_tpu as dft                    # noqa: E402
from duoformer_tcga_tpu import train as train_lib   # noqa: E402
from duoformer_tcga_tpu.data import pipeline as dl  # noqa: E402
from duoformer_tcga_tpu.ops.quantize import (       # noqa: E402
    quantize_attention_weights, quantize_mlp_weights)

TRUNK = "/tmp/r4_converge/trunk_tint.torch"


def build(dtype=jnp.bfloat16, apply_fc_norm=False):
    # convergence uses apply_fc_norm=True: the bit-faithful bf16 config
    # is a measured non-trainer at full size regardless of quantization
    # (Q7 knife-edge) — the int8 question must not be confounded with it
    return dft.build_model_no_extra_params(
        num_classes=2, num_layers=2, embed_dim=768, proj_dim=768,
        num_heads=12, depth=12, apply_fc_norm=apply_fc_norm, dtype=dtype)


def make_ste_step(model, opt, int8: bool):
    """Manual train step; int8=True quantizes the transformer GEMM
    weights per step and runs the a8w8 forward, with the bf16 VJP as
    the straight-through backward."""

    def fwd_bf16(p, image):
        return model.apply(p, image, train=False)

    if int8:
        @jax.custom_vjp
        def logits_fn(p, image):
            q = quantize_attention_weights(quantize_mlp_weights(p))
            return model.apply(q, image, train=False)

        def _fwd(p, image):
            return logits_fn(p, image), (p, image)

        def _bwd(res, ct):
            p, image = res
            _, vjp = jax.vjp(lambda pp: fwd_bf16(pp, image), p)
            return vjp(ct)[0], jnp.zeros_like(image)

        logits_fn.defvjp(_fwd, _bwd)
    else:
        logits_fn = fwd_bf16

    def step(state, batch):
        def loss_fn(p):
            logits = logits_fn(p, batch["image"]).astype(jnp.float32)
            return train_lib.cross_entropy(logits, batch["label"])

        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        updates, opt_state = opt.update(grads, state["opt_state"],
                                        state["params"])
        params = optax.apply_updates(state["params"], updates)
        return {"params": params, "opt_state": opt_state,
                "step": state["step"] + 1}, loss

    return step


def throughput():
    BATCH, ITERS = 64, 8
    model = build()
    for label, int8 in (("bf16 anchor", False), ("int8-STE", True)):
        opt = train_lib.make_optimizer(
            train_lib.onecycle_schedule(1e-4, 1000), weight_decay=1e-4,
            frozen_label_fn=train_lib.backbone_frozen_labels)
        params = model.init(jax.random.PRNGKey(0))
        state = {"params": params,
                 "opt_state": jax.jit(opt.init)(params),
                 "step": jnp.zeros((), jnp.int32)}
        step = make_ste_step(model, opt, int8)
        b = {"image": jax.random.normal(jax.random.PRNGKey(1),
                                        (BATCH, 224, 224, 3),
                                        jnp.bfloat16),
             "label": jnp.zeros((BATCH,), jnp.int32)}

        def run_n(state, b, n):
            def body(i, carry):
                st, acc = carry
                bi = {"image": b["image"] + (i.astype(b["image"].dtype) * 0),
                      "label": b["label"]}
                st, loss = step(st, bi)
                return st, acc + loss.astype(jnp.float32)
            _, acc = jax.lax.fori_loop(0, n, body,
                                       (state, jnp.float32(0.0)))
            return acc

        chained = jax.jit(run_n, static_argnames=())
        _ = np.asarray(chained(state, b, 2))
        t1 = time.perf_counter()
        _ = np.asarray(chained(state, b, 1))
        t1 = time.perf_counter() - t1
        tN = time.perf_counter()
        _ = np.asarray(chained(state, b, ITERS + 1))
        tN = time.perf_counter() - tN
        dt = (tN - t1) / ITERS
        print(f"[A {label}] {dt * 1e3:.1f} ms/step = "
              f"{BATCH / dt:.1f} tiles/s", flush=True)


def convergence():
    BATCH, STEPS = 128, 150
    model = build(apply_fc_norm=True)
    opt = train_lib.make_optimizer(
        train_lib.onecycle_schedule(3e-4, STEPS),
        frozen_label_fn=train_lib.backbone_frozen_labels)
    params = model.init(jax.random.PRNGKey(2))
    params = train_lib.warm_start_params(model, params,
                                         init_backbone=TRUNK)
    state = {"params": params,
             "opt_state": jax.jit(opt.init)(params),
             "step": jnp.zeros((), jnp.int32)}
    step = jax.jit(make_ste_step(model, opt, int8=True))
    fwd = jax.jit(lambda p, x: model.apply(
        quantize_attention_weights(quantize_mlp_weights(p)), x,
        train=False))
    ev = [(jnp.asarray(r["image"]), r["label"]) for _, r in
          zip(range(4), dl.synthetic_tiles(64, 2, seed=777,
                                           learnable=True))]

    def eacc(params):
        c = n = 0
        for xi, y in ev:
            x = dl.preprocess_tiles(xi, dtype=jnp.bfloat16)
            c += int((np.asarray(fwd(params, x)).argmax(-1) == y).sum())
            n += len(y)
        return c / n

    best = 0.0
    t0 = time.time()
    for i, raw in zip(range(STEPS),
                      dl.synthetic_tiles(BATCH, 2, seed=11,
                                         learnable=True)):
        b = {"image": dl.preprocess_tiles(jnp.asarray(raw["image"]),
                                          dtype=jnp.bfloat16),
             "label": jnp.asarray(raw["label"])}
        state, loss = step(state, b)
        if (i + 1) % 25 == 0:
            acc = eacc(state["params"])
            best = max(best, acc)
            print(f"[B int8-STE {i + 1}] loss={float(loss):.4f} "
                  f"eval={acc:.3f} ({time.time() - t0:.0f}s)", flush=True)
            if best >= 0.95:
                break
    print(f"[B int8-STE] BEST eval {best:.3f} "
          f"(gate 0.75: {'PASS' if best >= 0.75 else 'FAIL'})", flush=True)


if __name__ == "__main__":
    throughput()
    if os.path.exists(TRUNK):
        convergence()
    else:
        print(f"[B] SKIP: {TRUNK} missing (re-run the r4 converge probe "
              f"to regenerate)", flush=True)
