"""Benchmark: DuoFormer forward throughput (224^2 tiles/sec/chip).

Primary metric per BASELINE.md: flagship 2-scale release DuoFormer forward,
batch-256 224^2 tiles, bf16, single chip. vs_baseline is the ratio against
the PyTorch-CPU reference forward (the torch oracle of the same
architecture, full size), measured once and cached in
baseline_torch_cpu.json since the reference publishes no numbers
(SURVEY §6).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import os
import sys
import time

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "baseline_torch_cpu.json")


def measure_torch_cpu(batch=32, iters=3):
    """PyTorch-CPU denominator: same architecture, full size, eval mode."""
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "tests"))
    from torch_oracle import OracleDuoFormer

    torch.manual_seed(0)
    model = OracleDuoFormer(depth=12, embed_dim=768, num_heads=12,
                            num_classes=2, num_layers=2, proj_dim=768)
    model.eval()
    x = torch.randn(batch, 3, 224, 224)
    with torch.no_grad():
        model(x)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            model(x)
        dt = (time.perf_counter() - t0) / iters
    return batch / dt   # tiles/sec


def measure_torch_cpu_train(batch=8, iters=2):
    """Torch-CPU TRAIN-step denominator: the same recipe as measure_train
    below — frozen backbone (eval-mode BN, no backbone grads), Adam with
    L2 weight decay + OneCycleLR, cross-entropy — full-size model."""
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "tests"))
    from torch_oracle import OracleDuoFormer

    torch.manual_seed(0)
    model = OracleDuoFormer(depth=12, embed_dim=768, num_heads=12,
                            num_classes=2, num_layers=2, proj_dim=768)
    model.train()
    model.resnet_projector.eval()           # frozen backbone: running-stat BN
    for p in model.resnet_projector.parameters():
        p.requires_grad_(False)
    opt = torch.optim.Adam(
        (p for p in model.parameters() if p.requires_grad),
        lr=1e-4, weight_decay=1e-4)
    sched = torch.optim.lr_scheduler.OneCycleLR(opt, max_lr=1e-4,
                                                total_steps=1000)
    lossf = torch.nn.CrossEntropyLoss()
    x = torch.randn(batch, 3, 224, 224)
    y = torch.zeros(batch, dtype=torch.long)

    def step():
        opt.zero_grad(set_to_none=True)
        loss = lossf(model(x), y)
        loss.backward()
        opt.step()
        sched.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = (time.perf_counter() - t0) / iters
    return batch / dt   # tiles/sec


def _load_baseline():
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            return json.load(f)
    return {}


def torch_baseline(rebuild=False):
    """The committed PINNED denominator (round-1 quiet-host measurement).
    Never regenerated implicitly: round 2 accidentally re-measured on a
    loaded host (0.958 -> 0.715 tiles/s) which made vs_baseline
    incomparable across rounds. Absolute tiles/sec/chip is the headline;
    --rebaseline overwrites the pinned file deliberately."""
    data = _load_baseline()
    if not rebuild and "tiles_per_sec" in data:
        return data["tiles_per_sec"]
    tps = measure_torch_cpu()
    data.update({"tiles_per_sec": tps,
                 "config": "DuoFormer 2-scale 768/12/12, torch CPU fp32, "
                           "forward-only", "pinned": False})
    with open(BASELINE_FILE, "w") as f:
        json.dump(data, f, indent=1)
    return tps


def torch_train_baseline(rebuild=False):
    """Pinned torch-CPU TRAIN-step denominator (same pin-once discipline
    as torch_baseline; VERDICT r2 weak #4). Returns None when the pinned
    file has no train entry and rebuild=False — the caller reports
    vs_baseline 0.0 rather than measuring on an unknown-load host."""
    data = _load_baseline()
    if not rebuild:
        return data.get("train_tiles_per_sec")
    tps = measure_torch_cpu_train()
    data.update({
        "train_tiles_per_sec": tps,
        "train_config": "DuoFormer 2-scale 768/12/12, torch CPU fp32 "
                        "train step (frozen backbone, Adam+OneCycleLR, "
                        "CE), batch 8",
        "train_pinned": False,
    })
    with open(BASELINE_FILE, "w") as f:
        json.dump(data, f, indent=1)
    return tps


def measure_jax(batch=256, iters=20, dtype="bfloat16"):
    """Times `iters` forwards chained inside ONE jit (lax.fori_loop with a
    per-iteration input perturbation so XLA cannot CSE them), fetching a
    scalar once. This is robust against async-dispatch undertiming: on this
    environment's tunneled TPU, block_until_ready returns early, so only a
    device->host value transfer proves completion."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    import duoformer_tcga_tpu as dft

    from duoformer_tcga_tpu.models.duoformer import fold_for_inference

    model = dft.build_model_no_extra_params(
        num_classes=2, num_layers=2, embed_dim=768, proj_dim=768,
        num_heads=12, depth=12, dtype=getattr(jnp, dtype))
    params = fold_for_inference(model.init(jax.random.PRNGKey(0)))
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 224, 224, 3),
                          getattr(jnp, dtype))

    # params/x MUST be jit arguments, not closures: closed-over arrays are
    # baked into the HLO as constants, and this environment's remote
    # compile service rejects the resulting ~600MB request (HTTP 413).
    def run_n(params, x, n):
        def body(i, acc):
            xi = x + (i.astype(x.dtype) * 0)  # data dependence on i
            logits = model.apply(params, xi, train=False)
            return acc + logits.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    chained = jax.jit(run_n)                      # n dynamic: one compile
    _ = np.asarray(chained(params, x, 2))         # compile + warmup
    t1 = time.perf_counter()
    _ = np.asarray(chained(params, x, 1))
    t1 = time.perf_counter() - t1
    tN = time.perf_counter()
    _ = np.asarray(chained(params, x, iters + 1))
    tN = time.perf_counter() - tN
    # subtract the 1-iter run to cancel fixed dispatch/transfer latency
    dt = (tN - t1) / iters
    return batch / dt   # tiles/sec on this chip


def _train_throughput(model, batch, iters, dtype="bfloat16",
                      augment="none", jitter=0.0):
    """Chained-jit train-step throughput for one built model: `iters`
    production steps (frozen backbone, Adam+OneCycle, speed-accum memory
    plan) inside ONE jit, fetching the accumulated LOSS (anything less
    lets XLA DCE the model out of the loop)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from duoformer_tcga_tpu import train as train_lib

    sched = train_lib.onecycle_schedule(1e-4, total_steps=1000)
    opt = train_lib.make_optimizer(
        sched, weight_decay=1e-4,
        frozen_label_fn=train_lib.backbone_frozen_labels)
    state = train_lib.init_train_state(model, jax.random.PRNGKey(0), opt)
    batch_d = {"image": jax.random.normal(jax.random.PRNGKey(1),
                                          (batch, 224, 224, 3),
                                          getattr(jnp, dtype)),
               "label": jnp.zeros((batch,), jnp.int32)}
    # the production memory/speed policy (accumulation is exact-math and
    # measured faster at microbatch 32: docs/performance.md accum sweep)
    plan = train_lib.plan_train_memory(model, batch)
    step = train_lib.make_train_step(model, opt, donate=False,
                                     frozen_label_fn=train_lib.backbone_frozen_labels,
                                     accum_steps=plan["accum_steps"],
                                     augment=augment, jitter=jitter)

    def run_n(state, b, rng, n):
        def body(i, carry):
            st, acc = carry
            bi = {"image": b["image"] + (i.astype(b["image"].dtype) * 0),
                  "label": b["label"]}
            st, m = step(st, bi, rng)
            return st, acc + m["loss"].astype(jnp.float32)
        _, acc = jax.lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))
        return acc

    chained = jax.jit(run_n)
    rng = jax.random.PRNGKey(2)
    _ = np.asarray(chained(state, batch_d, rng, 2))
    t1 = time.perf_counter()
    _ = np.asarray(chained(state, batch_d, rng, 1))
    t1 = time.perf_counter() - t1
    tN = time.perf_counter()
    _ = np.asarray(chained(state, batch_d, rng, iters + 1))
    tN = time.perf_counter() - tN
    dt = (tN - t1) / iters
    return batch / dt


def measure_train(batch=256, iters=6, dtype="bfloat16",
                  augment="none", jitter=0.0):
    """Full train-step throughput (frozen backbone, Adam+OneCycle), same
    chained-jit methodology. Opt-in via --mode=train / DUOFORMER_BENCH=train
    — the driver contract (default invocation) stays the forward metric."""
    import jax.numpy as jnp

    import duoformer_tcga_tpu as dft

    model = dft.build_model_no_extra_params(
        num_classes=2, num_layers=2, embed_dim=768, proj_dim=768,
        num_heads=12, depth=12, dtype=getattr(jnp, dtype))
    return _train_throughput(model, batch, iters, dtype=dtype,
                             augment=augment, jitter=jitter)


def matrix_configs():
    """The variant matrix measured A/B in ONE process (VERDICT r3 weak #3:
    ad-hoc cross-process probe numbers carry ±15% spread, so per-variant
    regressions were invisible). Mirrors docs/performance.md's policy
    table: flagship anchor, release+drop (reg megakernels), 3-scale,
    legacy-channel at its reference hyperparams."""
    import jax.numpy as jnp

    import duoformer_tcga_tpu as dft

    return [
        ("flagship-2scale", 256, lambda: dft.build_model_no_extra_params(
            num_classes=2, num_layers=2, embed_dim=768, proj_dim=768,
            num_heads=12, depth=12, dtype=jnp.bfloat16)),
        ("release-drop0.1", 256, lambda: dft.build_model_no_extra_params(
            num_classes=2, num_layers=2, embed_dim=768, proj_dim=768,
            num_heads=12, depth=12, attn_drop_rate=0.1, proj_drop_rate=0.1,
            dtype=jnp.bfloat16)),
        ("release-3scale", 128, lambda: dft.build_model_no_extra_params(
            num_classes=2, num_layers=3, embed_dim=768, proj_dim=768,
            num_heads=12, depth=12, dtype=jnp.bfloat16)),
        ("legacy-channel", 128, lambda: dft.build_model(
            num_classes=2, num_layers=2, embed_dim=768, proj_dim=768,
            pretrained=False, dtype=jnp.bfloat16)),
    ]


def measure_matrix(iters=4):
    """One JSON line per variant, all measured in THIS process."""
    out = []
    for name, batch, build in matrix_configs():
        try:
            tps = _train_throughput(build(), batch, iters)
            row = {"metric": f"224^2 tiles/sec/chip ({name} TRAIN step, "
                             f"bf16, batch {batch})",
                   "value": round(tps, 2), "unit": "tiles/sec/chip",
                   "vs_baseline": 0.0}
        except Exception as e:   # report, keep measuring the rest
            row = {"metric": f"{name} TRAIN step", "value": 0.0,
                   "unit": "tiles/sec/chip", "vs_baseline": 0.0,
                   "error": f"{type(e).__name__}: {str(e)[:160]}"}
        print(json.dumps(row), flush=True)
        out.append(row)
    return out


def main():
    from duoformer_tcga_tpu.utils import profiling
    profiling.enable_compile_cache()   # DUOFORMER_COMPILE_CACHE, no-op unset
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--rebaseline", action="store_true")
    ap.add_argument("--rebaseline-train", action="store_true",
                    help="re-measure the pinned torch-CPU train denominator "
                         "(only do this on a quiet host)")
    ap.add_argument("--mode", default=os.environ.get("DUOFORMER_BENCH",
                                                     "forward"),
                    choices=["forward", "train", "matrix"])
    args = ap.parse_args()

    if args.mode == "matrix":
        measure_matrix(iters=min(args.iters, 6))
        return

    if args.mode == "train":
        tbl = torch_train_baseline(rebuild=args.rebaseline_train)
        tps = measure_train(batch=args.batch, iters=args.iters)
        print(json.dumps({
            "metric": "224^2 tiles/sec/chip (DuoFormer 2-scale TRAIN step, "
                      f"bf16, frozen backbone, batch {args.batch})",
            "value": round(tps, 2),
            "unit": "tiles/sec/chip",
            "vs_baseline": round(tps / tbl, 2) if tbl else 0.0,
        }))
        return

    baseline = torch_baseline(rebuild=args.rebaseline)
    try:
        tps = measure_jax(batch=args.batch, iters=args.iters)
    except Exception as e:   # e.g. fused-kernel lowering issue on new HW
        if os.environ.get("DUOFORMER_FUSED_ATTN") == "0":
            raise
        print(f"# fused path failed ({type(e).__name__}); retrying with "
              f"XLA attention", file=sys.stderr)
        os.environ["DUOFORMER_FUSED_ATTN"] = "0"
        tps = measure_jax(batch=args.batch, iters=args.iters)
    print(json.dumps({
        "metric": "224^2 tiles/sec/chip (DuoFormer 2-scale forward, bf16, "
                  f"batch {args.batch})",
        "value": round(tps, 2),
        "unit": "tiles/sec/chip",
        "vs_baseline": round(tps / baseline, 2),
    }))


if __name__ == "__main__":
    main()
