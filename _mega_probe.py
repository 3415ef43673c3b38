"""Megakernel effect on real TPU. (working file)"""
import os, time
import numpy as np
import jax, jax.numpy as jnp
import duoformer_tcga_tpu as dft

B = 256
model = dft.build_model_no_extra_params(num_classes=2, num_layers=2,
    embed_dim=768, proj_dim=768, num_heads=12, depth=12, dtype=jnp.bfloat16)
params = model.init(jax.random.PRNGKey(0))
tokens = jax.random.normal(jax.random.PRNGKey(2), (B, 49, 6, 768), jnp.bfloat16)

def timeit(name, fn, p, t, iters=10):
    def run(p, t, n):
        def body(i, acc):
            return acc + fn(p, t + (i.astype(t.dtype)*0)).astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    g = jax.jit(run)
    t0=time.perf_counter(); _=np.asarray(g(p, t, 2)); c=time.perf_counter()-t0
    t1=time.perf_counter(); _=np.asarray(g(p, t, 1)); t1=time.perf_counter()-t1
    tN=time.perf_counter(); _=np.asarray(g(p, t, iters+1)); tN=time.perf_counter()-tN
    print(f"{name}: {(tN-t1)/iters*1e3:.1f} ms/iter (compile {c:.0f}s)", flush=True)

os.environ["DUOFORMER_MEGAFUSE"] = "1"
try:
    timeit("transformer MEGAFUSED", lambda p, t: model.transformer.apply(p["transformer"], t), params, tokens)
    a = np.asarray(jax.jit(lambda p, t: model.transformer.apply(p["transformer"], t))(params, tokens[:4]).astype(jnp.float32))
except Exception as e:
    print("MEGAFUSE failed:", str(e)[:300], flush=True)
    a = None
os.environ["DUOFORMER_MEGAFUSE"] = "0"
timeit("transformer plain-fused", lambda p, t: model.transformer.apply(p["transformer"], t, train=False), params, tokens)
if a is not None:
    b = np.asarray(jax.jit(lambda p, t: model.transformer.apply(p["transformer"], t, rng=None))(params, tokens[:4]).astype(jnp.float32))
    print("mega parity max|diff|:", np.abs(a-b).max(), flush=True)
