"""Device-rate streaming measurement (VERDICT r3 weak #5): what does the
serving dispatch pipeline cost when H2D is NOT tunnel-bound?

Feeds the Predictor's jitted step from DEVICE-RESIDENT uint8 tile batches
(uploaded once, reused round-robin), so the ~50MB/s dev-tunnel upload is
out of the path. Three measurements in ONE process:

  a. chained-jit anchor (bench.py methodology) — pure device compute
  b. pipelined per-batch dispatch: dispatch batch i+1, then fetch batch
     i's logits (the DynamicBatcher's dispatch/fetch overlap) — the
     honest "batcher design" number minus HTTP/tunnel
  c. synchronous per-batch dispatch (fetch every batch before the next)

On a real TPU host the tunnel RTT in (b)/(c) also disappears; here it is
visible and reported as-is.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np             # noqa: E402
import jax                     # noqa: E402
import jax.numpy as jnp        # noqa: E402

import duoformer_tcga_tpu as dft                          # noqa: E402
from duoformer_tcga_tpu.data import pipeline as pipe      # noqa: E402
from duoformer_tcga_tpu.models.duoformer import fold_for_inference  # noqa: E402

BATCH = 256
K = 4           # distinct device-resident batches
N = 40          # dispatches per measurement


def main():
    model = dft.build_model_no_extra_params(
        num_classes=2, num_layers=2, embed_dim=768, proj_dim=768,
        num_heads=12, depth=12, dtype=jnp.bfloat16)
    params = fold_for_inference(model.init(jax.random.PRNGKey(0)))

    @jax.jit
    def step(p, raw):
        x = pipe.preprocess_tiles(raw, dtype=jnp.bfloat16)
        return model.apply(p, x, train=False)

    rng = np.random.default_rng(0)
    tiles = [jax.device_put(rng.integers(0, 256, (BATCH, 224, 224, 3),
                                         np.uint8))
             for _ in range(K)]

    # warmup/compile + result fetch (completion proof)
    _ = np.asarray(step(params, tiles[0]))

    # a. chained anchor
    def run_n(p, raw, n):
        def body(i, acc):
            r = raw + (i % 7).astype(jnp.uint8)   # defeat CSE
            logits = step(p, r)
            return acc + logits.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    chained = jax.jit(run_n)
    _ = np.asarray(chained(params, tiles[0], 2))
    t1 = time.perf_counter()
    _ = np.asarray(chained(params, tiles[0], 1))
    t1 = time.perf_counter() - t1
    tN = time.perf_counter()
    _ = np.asarray(chained(params, tiles[0], 21))
    tN = time.perf_counter() - tN
    print(f"[a chained anchor] {BATCH * 20 / (tN - t1):.1f} tiles/s",
          flush=True)

    # b. pipelined dispatch/fetch, device-resident source
    t0 = time.perf_counter()
    prev = None
    for i in range(N):
        out = step(params, tiles[i % K])
        if prev is not None:
            _ = np.asarray(prev)        # fetch batch i-1 while i runs
        prev = out
    _ = np.asarray(prev)
    dt = time.perf_counter() - t0
    print(f"[b pipelined device-resident] {BATCH * N / dt:.1f} tiles/s",
          flush=True)

    # c. synchronous per-batch
    t0 = time.perf_counter()
    for i in range(N):
        _ = np.asarray(step(params, tiles[i % K]))
    dt = time.perf_counter() - t0
    print(f"[c synchronous device-resident] {BATCH * N / dt:.1f} tiles/s",
          flush=True)

    # d. per-batch H2D from host numpy (tunnel visible), pipelined
    host = [rng.integers(0, 256, (BATCH, 224, 224, 3), np.uint8)
            for _ in range(K)]
    t0 = time.perf_counter()
    prev = None
    for i in range(12):
        out = step(params, jax.device_put(host[i % K]))
        if prev is not None:
            _ = np.asarray(prev)
        prev = out
    _ = np.asarray(prev)
    dt = time.perf_counter() - t0
    print(f"[d pipelined host H2D] {BATCH * 12 / dt:.1f} tiles/s", flush=True)


if __name__ == "__main__":
    main()
