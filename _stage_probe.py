"""Per-stage chained timing + fused-vs-XLA parity on real TPU. (working file)"""
import time
import numpy as np
import jax, jax.numpy as jnp
import duoformer_tcga_tpu as dft
from duoformer_tcga_tpu.models.duoformer import fold_for_inference
from duoformer_tcga_tpu.models import regroup

B = 256
model = dft.build_model_no_extra_params(num_classes=2, num_layers=2,
    embed_dim=768, proj_dim=768, num_heads=12, depth=12, dtype=jnp.bfloat16)
params = fold_for_inference(model.init(jax.random.PRNGKey(0)))
x = jax.random.normal(jax.random.PRNGKey(1), (B, 224, 224, 3), jnp.bfloat16)

def chain(fn):
    def run(params, x, n):
        def body(i, acc):
            out = fn(params, x + (i.astype(x.dtype) * 0))
            return acc + jax.tree.leaves(out)[0].astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    return jax.jit(run)

def timeit(name, fn, p, v, iters=10):
    g = chain(fn)
    t0 = time.perf_counter()
    _ = np.asarray(g(p, v, 2))
    print(f"{name}: compile {time.perf_counter()-t0:.0f}s", flush=True)
    t1 = time.perf_counter(); _ = np.asarray(g(p, v, 1)); t1 = time.perf_counter()-t1
    tN = time.perf_counter(); _ = np.asarray(g(p, v, iters+1)); tN = time.perf_counter()-tN
    ms = (tN - t1) / iters * 1e3
    print(f"{name}: {ms:.1f} ms/iter (B={B})", flush=True)

timeit("backbone", lambda p, v: model.resnet.apply(p["backbone"], v), params, x)

tokens = jax.random.normal(jax.random.PRNGKey(2), (B, 49, 6, 768), jnp.bfloat16)
timeit("transformer(fused)", lambda p, t: model.transformer.apply(p["transformer"], t), params, tokens)

# fused-vs-xla parity on real chip, small batch
import os
xs = x[:8]
f1 = jax.jit(lambda p, v: model.apply(p, v))
ref_fused = np.asarray(f1(params, xs).astype(jnp.float32))
os.environ["DUOFORMER_FUSED_ATTN"] = "0"
f2 = jax.jit(lambda p, v: model.apply(p, v, train=False))
ref_xla = np.asarray(f2(params, xs).astype(jnp.float32))
print("fused-vs-xla max|diff| (bf16, real TPU):", np.abs(ref_fused-ref_xla).max(), flush=True)
