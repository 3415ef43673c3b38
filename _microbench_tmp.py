import time, jax, jax.numpy as jnp, numpy as np
import functools
import duoformer_tcga_tpu as dft
from duoformer_tcga_tpu.models.transformer import scale_block_apply, _slice_block

model = dft.build_model_no_extra_params(num_classes=2, num_layers=2,
    embed_dim=768, proj_dim=768, num_heads=12, depth=12, dtype=jnp.bfloat16)
params = model.init(jax.random.PRNGKey(0))
p = params['transformer']
B=256
x = jax.random.normal(jax.random.PRNGKey(2), (B, 49, 6, 768), jnp.bfloat16)

def bench(name, fn, *args):
    t0=time.perf_counter()
    g = jax.jit(lambda *a: fn(*a).astype(jnp.float32).sum())
    _ = np.asarray(g(*args))
    print(f'{name}: compile+first {time.perf_counter()-t0:.1f} s', flush=True)
    ts=[]
    for _ in range(3):
        t0=time.perf_counter(); _=np.asarray(g(*args)); ts.append(time.perf_counter()-t0)
    print(f'{name}: {min(ts)*1e3:.1f} ms', flush=True)

a = jax.random.normal(jax.random.PRNGKey(4), (B*49*6, 768), jnp.bfloat16)
w = jax.random.normal(jax.random.PRNGKey(5), (768, 2304), jnp.bfloat16)
bench('raw qkv GEMM', lambda a, w: jnp.dot(a, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16), a, w)

blk = _slice_block(p['scale_blocks'], 0)
sa = functools.partial(scale_block_apply, num_heads=12)
bench('1 scale block', lambda b, h: sa(b, h), blk, x)
