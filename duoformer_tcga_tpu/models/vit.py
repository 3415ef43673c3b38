"""Vision Transformer (the framework's timm-VisionTransformer replacement).

The reference leans on timm's VisionTransformer for its baselines
(HybridModel bypasses its patch embed, /root/reference/models/model.py:356-383;
ViTBase16 wraps it whole, model.py:415-446). This is a from-scratch JAX ViT
with the same math: conv patch embed, CLS token, learned pos embed,
pre-norm blocks, final norm, linear head.

The transformer block is DuoFormer's ScaleBlock applied to [B, N, C] —
identical math (pre-norm MHSA + MLP with optional LayerScale), one
implementation for both stacks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import initializers as init
from ..ops import nn
from .transformer import _scan_blocks, scale_block_init, scale_block_apply, stack_init


class VisionTransformer:
    def __init__(self, img_size=224, patch_size=16, in_chans=3,
                 embed_dim=768, depth=12, num_heads=12, mlp_ratio=4.0,
                 num_classes=1000, qkv_bias=True, init_values=None,
                 drop_rate=0.0, attn_drop_rate=0.0, ln_eps=1e-6,
                 dtype=jnp.float32):
        assert img_size % patch_size == 0
        self.patch_size = patch_size
        self.grid = img_size // patch_size
        self.num_patches = self.grid ** 2
        self.embed_dim = embed_dim
        self.depth = depth
        self.num_heads = num_heads
        self.mlp_ratio = mlp_ratio
        self.num_classes = num_classes
        self.qkv_bias = qkv_bias
        self.init_values = init_values
        self.drop_rate = drop_rate
        self.attn_drop_rate = attn_drop_rate
        self.ln_eps = ln_eps
        self.dtype = dtype
        self.in_chans = in_chans

    def init(self, key):
        kp, kb, kpe, kcls, kh = jax.random.split(key, 5)
        d = self.dtype
        P = self.patch_size
        return {
            "patch_embed": nn.conv_init(kp, P, P, self.in_chans,
                                        self.embed_dim, scheme="torch", dtype=d),
            "cls_token": init.normal(kcls, (1, 1, self.embed_dim), std=1e-6, dtype=d),
            "pos_embed": init.trunc_normal(
                kpe, (1, self.num_patches + 1, self.embed_dim), std=0.02, dtype=d),
            "blocks": stack_init(scale_block_init, kb, self.depth,
                                 self.embed_dim, self.num_heads,
                                 self.mlp_ratio, self.qkv_bias, False,
                                 self.init_values, d),
            "norm": nn.layernorm_init(self.embed_dim, d),
            "head": nn.linear_init(kh, self.embed_dim, self.num_classes,
                                   scheme="vit", dtype=d),
        }

    def embed(self, params, x):
        """Patch embed + CLS + pos embed. x: [B, H, W, 3] NHWC."""
        B = x.shape[0]
        y = nn.conv2d(params["patch_embed"], x, stride=self.patch_size,
                      padding="VALID")                       # [B, g, g, C]
        y = y.reshape(B, self.num_patches, self.embed_dim)
        cls = jnp.broadcast_to(params["cls_token"].astype(y.dtype),
                               (B, 1, self.embed_dim))
        y = jnp.concatenate([cls, y], axis=1)
        return y + params["pos_embed"].astype(y.dtype)

    def forward_tokens(self, params, tokens, rng=None, train=False):
        """Run blocks + final norm on pre-built tokens [B, N, C] (the
        HybridModel patch-embed-bypass path, model.py:374-383)."""
        apply = functools.partial(
            scale_block_apply, num_heads=self.num_heads, scale=None,
            ln_eps=self.ln_eps, attn_drop=self.attn_drop_rate,
            proj_drop=self.drop_rate, train=train)
        tokens = _scan_blocks(apply, params["blocks"], tokens, rng, train,
                              self.depth)
        return nn.layernorm(params["norm"], tokens, self.ln_eps)

    def forward_head(self, params, tokens):
        return nn.linear(params["head"], tokens[:, 0, :])

    def apply(self, params, x, rng=None, train=False):
        tokens = self.embed(params, x)
        tokens = self.forward_tokens(params, tokens, rng, train)
        return self.forward_head(params, tokens)
