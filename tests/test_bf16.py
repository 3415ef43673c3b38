"""bf16 compute-path numerics: the serving dtype must stay close to f32."""

import numpy as np

import jax
import jax.numpy as jnp

import duoformer_tcga_tpu as dft


def test_bf16_training_grad():
    """Regression: bf16 model + grad must not hit the conv transpose
    dtype mismatch (preferred_element_type widening broke it)."""
    from duoformer_tcga_tpu import train as train_lib

    m = dft.build_model_no_extra_params(
        num_classes=2, num_layers=2, embed_dim=96, proj_dim=96,
        num_heads=12, depth=1, dtype=jnp.bfloat16)
    params = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 224, 224, 3),
                          jnp.bfloat16)
    y = jnp.array([0, 1], jnp.int32)

    def loss(p):
        lg = m.apply(p, x, rng=jax.random.PRNGKey(2), train=True)
        return train_lib.cross_entropy(lg, y)

    l, g = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(l))
    assert all(bool(jnp.isfinite(t).all()) for t in jax.tree.leaves(g))


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
