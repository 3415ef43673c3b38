"""Gated attention-based multiple-instance learning (MIL) over tile
embeddings — the slide-level classifier downstream of `cli predict
--embeddings=` / `Predictor.embed`.

The reference stops at tile-level classification (its evaluation() loop,
main_toy.py:39-54, scores tiles independently; slide calls are left to
offline averaging). Real TCGA deployment is slide-level: a whole-slide
image is a BAG of tile embeddings with one label, most tiles
uninformative. This module adds the standard learned aggregator — gated
attention pooling (Ilse et al., "Attention-based Deep Multiple Instance
Learning", 2018), the backbone of CLAM-style WSI pipelines:

    h_i            tile embeddings              [N, D]
    a_i = w' (tanh(V h_i) * sigmoid(U h_i))     gated attention logit
    alpha = softmax over the slide's VALID tiles (mask-aware)
    z = sum_i alpha_i h_i                       slide representation
    logits = W z + b

TPU shape discipline: slides are padded to a fixed tiles-per-slide N and
batched [B, N, D] with a validity mask [B, N]; the masked softmax makes
padding exact (padded rows get zero weight — logits are bit-identical
under extra padding, tested). Everything jits as one static-shape step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class GatedAttentionMIL:
    """Gated-attention MIL pooling + linear head.

    embed_dim: D of the incoming tile embeddings (DuoFormer CLS width).
    hidden: attention bottleneck (the paper's L; 128 default).
    Params are plain nested dicts like every other model here."""

    def __init__(self, embed_dim: int = 768, hidden: int = 128,
                 num_classes: int = 2, dtype=jnp.float32):
        self.embed_dim = embed_dim
        self.hidden = hidden
        self.num_classes = num_classes
        self.dtype = dtype

    def init(self, key):
        kv, ku, kw, kh = jax.random.split(key, 4)
        D, H, C = self.embed_dim, self.hidden, self.num_classes
        # torch-Linear-style uniform(-1/sqrt(fan_in), +) init
        def lin(k, fi, fo):
            b = 1.0 / (fi ** 0.5)
            return jax.random.uniform(k, (fi, fo), self.dtype, -b, b)
        return {
            "attn_V": {"w": lin(kv, D, H),
                       "b": jnp.zeros((H,), self.dtype)},
            "attn_U": {"w": lin(ku, D, H),
                       "b": jnp.zeros((H,), self.dtype)},
            "attn_w": {"w": lin(kw, H, 1),
                       "b": jnp.zeros((1,), self.dtype)},
            "head": {"w": lin(kh, D, C),
                     "b": jnp.zeros((C,), self.dtype)},
        }

    def apply(self, params, embs, mask, with_attention: bool = False):
        """embs: [B, N, D] tile embeddings (padded), mask: [B, N] (1 =
        real tile) -> logits [B, num_classes]; with_attention=True also
        returns the attention weights [B, N] (zero on padding) — the
        which-tiles-drove-the-call interpretability signal."""
        embs = embs.astype(self.dtype)
        mask = mask.astype(self.dtype)
        v = jnp.tanh(embs @ params["attn_V"]["w"] + params["attn_V"]["b"])
        u = jax.nn.sigmoid(
            embs @ params["attn_U"]["w"] + params["attn_U"]["b"])
        a = ((v * u) @ params["attn_w"]["w"] + params["attn_w"]["b"])[..., 0]
        a = jnp.where(mask > 0, a, jnp.float32(-1e30))   # exact pad-drop
        alpha = jax.nn.softmax(a, axis=-1) * mask
        # renormalize guards the all-padding row (softmax over -1e30s)
        alpha = alpha / jnp.maximum(alpha.sum(-1, keepdims=True), 1e-12)
        z = jnp.einsum("bn,bnd->bd", alpha, embs)
        logits = z @ params["head"]["w"] + params["head"]["b"]
        if with_attention:
            return logits, alpha
        return logits
