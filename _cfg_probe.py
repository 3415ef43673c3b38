"""4-scale forward + training-step throughput. (working file)"""
import time
import numpy as np
import jax, jax.numpy as jnp
import duoformer_tcga_tpu as dft
from duoformer_tcga_tpu import train as train_lib
from duoformer_tcga_tpu.models.duoformer import fold_for_inference

def bench_fwd(name, model, B, iters=10):
    params = fold_for_inference(model.init(jax.random.PRNGKey(0)))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 224, 224, 3), jnp.bfloat16)
    def run(p, v, n):
        def body(i, acc):
            return acc + model.apply(p, v + (i.astype(v.dtype)*0), train=False).astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    g = jax.jit(run)
    t0=time.perf_counter(); _=np.asarray(g(params, x, 2)); c=time.perf_counter()-t0
    t1=time.perf_counter(); _=np.asarray(g(params, x, 1)); t1=time.perf_counter()-t1
    tN=time.perf_counter(); _=np.asarray(g(params, x, iters+1)); tN=time.perf_counter()-tN
    dt=(tN-t1)/iters
    print(f"{name}: {B/dt:.0f} tiles/s ({dt*1e3:.0f} ms/batch, compile {c:.0f}s)", flush=True)

# 4-scale forward (batch 64: S=86 tokens is 14x the 2-scale compute)
m4 = dft.build_model_no_extra_params(num_classes=2, num_layers=4,
    embed_dim=768, proj_dim=768, num_heads=12, depth=12, dtype=jnp.bfloat16)
bench_fwd("4-scale fwd B=64", m4, 64)

# training step throughput, 2-scale, frozen backbone, bf16 compute
m2 = dft.build_model_no_extra_params(num_classes=2, num_layers=2,
    embed_dim=768, proj_dim=768, num_heads=12, depth=12, dtype=jnp.bfloat16)
opt = train_lib.make_optimizer(train_lib.onecycle_schedule(1e-4, 1000),
    weight_decay=1e-4, frozen_label_fn=train_lib.backbone_frozen_labels)
state = train_lib.init_train_state(m2, jax.random.PRNGKey(0), opt)
B = 128
batch = {"image": jax.random.normal(jax.random.PRNGKey(1), (B,224,224,3), jnp.bfloat16),
         "label": jnp.zeros((B,), jnp.int32)}
rng = jax.random.PRNGKey(2)
def trainN(state, batch, rng, n):
    def body(i, st):
        b = {"image": batch["image"] + (i.astype(jnp.bfloat16)*0), "label": batch["label"]}
        st, _ = step_inner(st, b, rng)
        return st
    return jax.lax.fori_loop(0, n, body, state)
step_inner = lambda st, b, r: train_lib.make_train_step.__wrapped__(m2, opt) if False else None
# build unjitted step fn
def make_step():
    def loss_fn(params, b, r):
        logits = m2.apply(params, b["image"], rng=r, train=True)
        return train_lib.cross_entropy(logits, b["label"]), logits
    import optax
    def stepf(st, b, r):
        (l, lg), g = jax.value_and_grad(loss_fn, has_aux=True)(st["params"], b, r)
        up, os_ = opt.update(g, st["opt_state"], st["params"])
        return {"params": optax.apply_updates(st["params"], up), "opt_state": os_,
                "step": st["step"]+1}, l
    return stepf
stepf = make_step()
def run_train(state, batch, rng, n):
    def body(i, st):
        b = {"image": batch["image"] + (i.astype(jnp.bfloat16)*0), "label": batch["label"]}
        st, _ = stepf(st, b, rng)
        return st
    return jax.lax.fori_loop(0, n, body, state)
g = jax.jit(run_train, donate_argnums=0)
import copy
t0=time.perf_counter(); s2=g(state, batch, rng, 2); _=np.asarray(s2["step"]); c=time.perf_counter()-t0
t1=time.perf_counter(); s3=g(s2, batch, rng, 1); _=np.asarray(s3["step"]); t1=time.perf_counter()-t1
tN=time.perf_counter(); s4=g(s3, batch, rng, 11); _=np.asarray(s4["step"]); tN=time.perf_counter()-tN
dt=(tN-t1)/10
print(f"train step B={B}: {B/dt:.0f} tiles/s ({dt*1e3:.0f} ms/step, compile {c:.0f}s)", flush=True)
