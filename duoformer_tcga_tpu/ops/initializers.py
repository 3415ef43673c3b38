"""Parameter initializers matching the reference's torch/timm init semantics.

The reference relies on three init families (see /root/reference):
  * timm ViT init ("mode=''" -> init_weights_vit_timm): Linear weights
    trunc_normal(std=0.02), biases zero  (scale_attention.py:158,327-328,
    multi_vision_transformer.py:112).
  * torch defaults: Linear = kaiming_uniform(a=sqrt(5)) + uniform bias
    (used for heads the reference never re-inits, scale_attention.py:320);
    Conv2d same family.
  * explicit calls: kaiming_normal_ for projection convs with bias
    normal(std=1e-6) (projection_head.py:119-132), trunc_normal(std=0.036)
    for scale pos-embeds, normal(std=0.036) for scale/cls tokens
    (scale_attention.py:155-158,323-328).

All functions take a PRNG key and return float32 arrays; distribution-level
parity is what matters for from-scratch training (bitwise RNG parity with
torch is not a goal).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    """timm trunc_normal_: N(0, std^2) truncated at +/- 2*std."""
    # jax truncated_normal samples from standard normal truncated to [-2, 2].
    return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * std


def normal(key, shape, std=1.0, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * std


def zeros(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)


def kaiming_normal_conv(key, shape, dtype=jnp.float32):
    """torch nn.init.kaiming_normal_ defaults (fan_in, leaky_relu a=0 -> gain sqrt(2)).

    `shape` is HWIO (kh, kw, in_ch, out_ch); fan_in = kh*kw*in_ch.
    """
    kh, kw, cin, _ = shape
    fan_in = kh * kw * cin
    std = math.sqrt(2.0 / fan_in)
    return jax.random.normal(key, shape, dtype) * std


def kaiming_normal_conv_fan_out(key, shape, dtype=jnp.float32):
    """torchvision ResNet conv init: kaiming_normal_(mode='fan_out',
    nonlinearity='relu'). shape is HWIO; fan_out = kh*kw*out_ch."""
    kh, kw, _, cout = shape
    fan_out = kh * kw * cout
    std = math.sqrt(2.0 / fan_out)
    return jax.random.normal(key, shape, dtype) * std


def xavier_uniform(key, shape, dtype=jnp.float32):
    """torch nn.init.xavier_uniform_ for a Linear weight stored as (in, out)."""
    fan_in, fan_out = shape[0], shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def torch_default_linear_weight(key, shape, dtype=jnp.float32):
    """torch nn.Linear default reset_parameters: kaiming_uniform(a=sqrt(5)).

    For weight stored (in, out): bound = sqrt(6 / ((1 + a^2) * fan_in))
    with a^2 = 5 -> bound = 1/sqrt(fan_in).
    """
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_default_bias(key, shape, fan_in, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_default_conv_weight(key, shape, dtype=jnp.float32):
    """torch nn.Conv2d default (kaiming_uniform a=sqrt(5)); shape HWIO."""
    kh, kw, cin, _ = shape
    fan_in = kh * kw * cin
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)
