"""A/B: in-kernel dW accumulation (DUOFORMER_BWD_DW) on the production
train step — flagship B=256, frozen backbone, speed-accum plan (micro 32).
One process; chained-jit methodology per probes/README.md."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np             # noqa: E402
import jax                     # noqa: E402
import jax.numpy as jnp        # noqa: E402

import duoformer_tcga_tpu as dft                    # noqa: E402
from duoformer_tcga_tpu import train as train_lib   # noqa: E402

BATCH = 256
ITERS = 6


def run_variant(label, env):
    prev = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        model = dft.build_model_no_extra_params(
            num_classes=2, num_layers=2, embed_dim=768, proj_dim=768,
            num_heads=12, depth=12, dtype=jnp.bfloat16)
        sched = train_lib.onecycle_schedule(1e-4, total_steps=1000)
        opt = train_lib.make_optimizer(
            sched, weight_decay=1e-4,
            frozen_label_fn=train_lib.backbone_frozen_labels)
        state = train_lib.init_train_state(model, jax.random.PRNGKey(0), opt)
        b = {"image": jax.random.normal(jax.random.PRNGKey(1),
                                        (BATCH, 224, 224, 3), jnp.bfloat16),
             "label": jnp.zeros((BATCH,), jnp.int32)}
        plan = {"accum_steps": 1}
        step = train_lib.make_train_step(
            model, opt, donate=False,
            frozen_label_fn=train_lib.backbone_frozen_labels,
            accum_steps=plan["accum_steps"])

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
        _ = np.asarray(chained(state, b, rng, 2))
        t1 = time.perf_counter()
        _ = np.asarray(chained(state, b, rng, 1))
        t1 = time.perf_counter() - t1
        tN = time.perf_counter()
        _ = np.asarray(chained(state, b, rng, ITERS + 1))
        tN = time.perf_counter() - tN
        dt = (tN - t1) / ITERS
        print(f"[{label}] {dt * 1e3:.1f} ms/step = {BATCH / dt:.1f} tiles/s "
              f"(accum={plan['accum_steps']})", flush=True)
    except Exception as e:
        print(f"[{label}] FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
    finally:
        for k, v in prev.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


if __name__ == "__main__":
    run_variant("accum1 dw=0 anchor", {"DUOFORMER_BWD_DW": "0"})
    for rows in ("128", "192"):
        run_variant(f"accum1 dw=1 rows={rows}",
                    {"DUOFORMER_BWD_DW": "1",
                     "DUOFORMER_BWD_DW_ROWS": rows})
