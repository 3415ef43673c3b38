"""T-packing effect on attention core + full transformer. (working file)"""
import os, time
import numpy as np
import jax, jax.numpy as jnp
import duoformer_tcga_tpu as dft
from duoformer_tcga_tpu.ops import pallas_attention as pa

B = 256
N = B * 49

def chain(fn):
    def run(p, t, n):
        def body(i, acc):
            out = fn(p, t + (i.astype(t.dtype) * 0))
            return acc + out.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    return jax.jit(run)

def timeit(name, fn, p, t, iters=10):
    g = chain(fn)
    t0 = time.perf_counter(); _ = np.asarray(g(p, t, 2)); c = time.perf_counter()-t0
    t1 = time.perf_counter(); _ = np.asarray(g(p, t, 1)); t1 = time.perf_counter()-t1
    tN = time.perf_counter(); _ = np.asarray(g(p, t, iters+1)); tN = time.perf_counter()-tN
    print(f"{name}: {(tN-t1)/iters*1e3:.1f} ms/iter (compile {c:.0f}s)", flush=True)

qkv = jax.random.normal(jax.random.PRNGKey(1), (N, 6, 2304), jnp.bfloat16)
dummy = jnp.zeros((1,))
def attn12(p, q):
    for _ in range(12):
        o = pa.block_diag_attention(q, 12, 6, 0.125)
        q = jnp.concatenate([o, o, o], axis=-1)
    return q
timeit("12x attn core T-packed", attn12, dummy, qkv)

model = dft.build_model_no_extra_params(num_classes=2, num_layers=2,
    embed_dim=768, proj_dim=768, num_heads=12, depth=12, dtype=jnp.bfloat16)
params = model.init(jax.random.PRNGKey(0))
tokens = jax.random.normal(jax.random.PRNGKey(2), (B, 49, 6, 768), jnp.bfloat16)
timeit("transformer T-packed", lambda p, t: model.transformer.apply(p, t), params["transformer"], tokens)

# parity check vs XLA ref
o1 = np.asarray(pa.block_diag_attention(qkv[:1000], 12, 6, 0.125).astype(jnp.float32))
o2 = np.asarray(pa._xla_reference(qkv[:1000], 12, 6, 0.125).astype(jnp.float32))
print("T-packed parity:", np.abs(o1-o2).max(), flush=True)
