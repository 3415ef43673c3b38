"""Does a larger EFFECTIVE batch at the fixed microbatch-32 optimum beat
599 tiles/s? B=256 accum8 is the production config; B=512 accum16 and
B=1024 accum32 run the same per-microbatch shapes but amortize the
once-per-step optimizer/param update (~4.3 ms) over more tiles. The
earlier B=288/320 negative was at accum1 (activation pressure) — this
holds the microbatch constant. One process, chained-jit."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np             # noqa: E402
import jax                     # noqa: E402
import jax.numpy as jnp        # noqa: E402

import duoformer_tcga_tpu as dft                          # noqa: E402
from duoformer_tcga_tpu import train as train_lib         # noqa: E402


def run(batch, accum, iters=6):
    model = dft.build_model_no_extra_params(
        num_classes=2, num_layers=2, embed_dim=768, proj_dim=768,
        num_heads=12, depth=12, dtype=jnp.bfloat16)
    sched = train_lib.onecycle_schedule(1e-4, total_steps=1000)
    opt = train_lib.make_optimizer(
        sched, weight_decay=1e-4,
        frozen_label_fn=train_lib.backbone_frozen_labels)
    state = train_lib.init_train_state(model, jax.random.PRNGKey(0), opt)
    b = {"image": jax.random.normal(jax.random.PRNGKey(1),
                                    (batch, 224, 224, 3), jnp.bfloat16),
         "label": jnp.zeros((batch,), jnp.int32)}
    step = train_lib.make_train_step(
        model, opt, donate=False,
        frozen_label_fn=train_lib.backbone_frozen_labels,
        accum_steps=accum)

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
    _ = np.asarray(chained(state, b, rng, iters + 1))
    tN = time.perf_counter() - tN
    dt = (tN - t1) / iters
    print(f"[B={batch} accum={accum}] {dt * 1e3:.1f} ms/step = "
          f"{batch / dt:.1f} tiles/s", flush=True)


if __name__ == "__main__":
    run(256, 8)                 # anchor
    run(512, 16, iters=4)
    run(1024, 32, iters=2)
