"""bf16 compute-path numerics: the serving dtype must stay close to f32."""

import numpy as np

import jax
import jax.numpy as jnp

import duoformer_tcga_tpu as dft


def test_bf16_close_to_f32():
    kw = dict(num_classes=4, num_layers=2, embed_dim=96, proj_dim=96,
              num_heads=12, depth=2)
    m32 = dft.build_model_no_extra_params(dtype=jnp.float32, **kw)
    m16 = dft.build_model_no_extra_params(dtype=jnp.bfloat16, **kw)
    params = m32.init(jax.random.PRNGKey(0))   # f32 params, shared
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 224, 224, 3))

    ref = np.asarray(m32.apply(params, x))
    out = np.asarray(m16.apply(params, x.astype(jnp.bfloat16))
                     .astype(jnp.float32))
    # logits at init are O(0.1); bf16 has ~3 decimal digits
    assert np.max(np.abs(out - ref)) < 0.15 * (np.abs(ref).max() + 1.0)
    # prediction agreement matters more than absolute values
    assert (out.argmax(-1) == ref.argmax(-1)).all()
