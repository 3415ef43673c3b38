import time
import numpy as np
import jax, jax.numpy as jnp
import optax
import duoformer_tcga_tpu as dft
from duoformer_tcga_tpu import train as train_lib

def bench_train(B, remat, iters=10):
    m2 = dft.build_model_no_extra_params(num_classes=2, num_layers=2,
        embed_dim=768, proj_dim=768, num_heads=12, depth=12,
        dtype=jnp.bfloat16, remat=remat)
    opt = train_lib.make_optimizer(train_lib.onecycle_schedule(1e-4, 1000),
        weight_decay=1e-4, frozen_label_fn=train_lib.backbone_frozen_labels)
    state = train_lib.init_train_state(m2, jax.random.PRNGKey(0), opt)
    batch = {"image": jax.random.normal(jax.random.PRNGKey(1), (B,224,224,3), jnp.bfloat16),
             "label": jnp.zeros((B,), jnp.int32)}
    rng = jax.random.PRNGKey(2)

    def loss_fn(params, b, r):
        logits = m2.apply(params, b["image"], rng=r, train=True)
        return train_lib.cross_entropy(logits, b["label"]), logits

    def stepf(st, b, r):
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(st["params"], b, r)
        up, os_ = opt.update(g, st["opt_state"], st["params"])
        return {"params": optax.apply_updates(st["params"], up), "opt_state": os_,
                "step": st["step"]+1}, l

    def run_train(state, batch, rng, n):
        def body(i, st):
            b = {"image": batch["image"] + (i.astype(jnp.bfloat16)*0), "label": batch["label"]}
            st, _ = stepf(st, b, rng)
            return st
        return jax.lax.fori_loop(0, n, body, state)

    g = jax.jit(run_train, donate_argnums=0)
    try:
        t0=time.perf_counter(); s2=g(state, batch, rng, 2); _=np.asarray(s2["step"]); c=time.perf_counter()-t0
    except Exception as e:
        print(f"train B={B} remat={remat}: FAILED {str(e)[:120]}", flush=True)
        return
    t1=time.perf_counter(); s3=g(s2, batch, rng, 1); _=np.asarray(s3["step"]); t1=time.perf_counter()-t1
    tN=time.perf_counter(); s4=g(s3, batch, rng, iters+1); _=np.asarray(s4["step"]); tN=time.perf_counter()-tN
    dt=(tN-t1)/iters
    print(f"train B={B} remat={remat}: {B/dt:.0f} tiles/s ({dt*1e3:.0f} ms/step, compile {c:.0f}s)", flush=True)

bench_train(64, False)
bench_train(128, True)
