"""One-shot TPU perf probe: XLA vs Pallas attention, per-stage costs.
(Working file, not part of the library.)"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import duoformer_tcga_tpu as dft
from duoformer_tcga_tpu.ops import pallas_attention as pa

B = 256


def timeit(name, fn, *args, iters=5):
    g = jax.jit(lambda *a: jax.tree.map(
        lambda t: t.astype(jnp.float32).sum(), fn(*a)))
    t0 = time.perf_counter()
    r = g(*args)
    _ = np.asarray(jax.tree.leaves(r)[0])
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = g(*args)
        _ = np.asarray(jax.tree.leaves(r)[0])
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1e3:.1f} ms (compile {compile_s:.0f}s)", flush=True)
    return min(ts)


def main():
    key = jax.random.PRNGKey(0)

    # raw GEMM floor
    a = jax.random.normal(key, (B * 49 * 6, 768), jnp.bfloat16)
    w = jax.random.normal(key, (768, 2304), jnp.bfloat16)
    t = timeit("raw qkv GEMM [75k x 768 x 2304]",
               lambda a, w: jnp.dot(a, w, preferred_element_type=jnp.float32)
               .astype(jnp.bfloat16), a, w)
    print(f"  -> {2*a.shape[0]*768*2304/t/1e12:.1f} TFLOP/s", flush=True)

    # attention core: XLA vs Pallas, 2-scale shape
    qkv = jax.random.normal(key, (B * 49, 6, 3 * 768), jnp.bfloat16)
    timeit("attn core 6-tok XLA", lambda q: pa._xla_reference(q, 12, 6, 0.125), qkv)
    timeit("attn core 6-tok Pallas", lambda q: pa.block_diag_attention(q, 12, 6, 0.125), qkv)

    # 4-scale shape
    qkv86 = jax.random.normal(key, (B * 49, 86, 3 * 768), jnp.bfloat16)
    timeit("attn core 86-tok XLA", lambda q: pa._xla_reference(q, 12, 86, 0.125), qkv86)
    timeit("attn core 86-tok Pallas", lambda q: pa.block_diag_attention(q, 12, 86, 0.125), qkv86)

    # full model: fused off vs on
    import os
    model = dft.build_model_no_extra_params(
        num_classes=2, num_layers=2, embed_dim=768, proj_dim=768,
        num_heads=12, depth=12, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(key, (B, 224, 224, 3), jnp.bfloat16)

    os.environ["DUOFORMER_FUSED_ATTN"] = "0"
    t_xla = timeit("full model XLA attn", lambda p, v: model.apply(p, v), params, x, iters=3)
    os.environ["DUOFORMER_FUSED_ATTN"] = "1"
    t_pal = timeit("full model Pallas attn", lambda p, v: model.apply(p, v), params, x, iters=3)
    print(f"tiles/s: XLA {B/t_xla:.0f}  Pallas {B/t_pal:.0f}", flush=True)

    # parity check on TPU
    os.environ["DUOFORMER_FUSED_ATTN"] = "0"
    ref = np.asarray(jax.jit(lambda p, v: model.apply(p, v))(params, x[:8]).astype(jnp.float32))
    os.environ["DUOFORMER_FUSED_ATTN"] = "1"
    out = np.asarray(jax.jit(lambda p, v: model.apply(p, v), )(params, x[:8]).astype(jnp.float32))
    print("fused-vs-xla max diff (bf16 model):", np.abs(ref - out).max(), flush=True)


if __name__ == "__main__":
    main()
