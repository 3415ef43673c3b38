"""Attention-map extraction for the DuoFormer families (interpretability).

Pathology users need to see WHERE the model looked: which pyramid scales a
region weighted (scale attention) and which of the 49 regions the CLS
token weighted (patch/region attention). The reference exposes nothing —
its forwards return logits only (model_wo_extra_params.py:226-302) — so
this is new framework capability.

Design: a diagnostic twin of the eval-mode forward that walks the stacked
block params depth-by-depth on the XLA attention path (the fused kernels
never materialize attention probabilities — that is their point) and
collects the probability tensors. It reuses the exact primitives of the
production path (nn.layernorm / _qkv_heads / the same einsum
contractions), and tests pin its logits to model.apply bitwise-close
(tests/test_interpret.py) so the maps describe the real model, not a
drifted re-implementation.

Maps returned (all float32, head-averaged):
  * scale_attn  [B, depth, 49, S+1]  — per block, each region's
    scale-token attention over its S+1 multi-scale tokens (row 0 of the
    scale-attention matrix; token order: [scale token, coarsest .. finest],
    models/regroup.py).
  * patch_attn  [B, depth, 50]       — per block, the CLS row over
    [CLS] + 49 region tokens.
  * region_rollout [B, 49]           — attention rollout across the patch
    stack: the chained PatchBlocks apply attention with NO residual/MLP
    (scale_attention.py:214-236), so the product of the head-averaged
    attention matrices is exactly the linear token-mixing operator;
    the CLS row, restricted to the 49 regions and renormalized, is the
    standard "how much did each region contribute to the prediction"
    saliency. Regions are row-major over the 7x7 grid of the 224^2 tile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import attention as attn_ops
from ..ops import nn
from . import regroup
from .transformer import _maybe_ls, _slice_block


def _mha_probs(p, x, num_heads, scale=None, apply_qk_norm=True,
               qk_norm_eps=1e-6):
    """multihead_attention's XLA path, additionally returning the
    attention probabilities [..., H, S, S] (f32)."""
    *lead, S, C = x.shape
    D = C // num_heads
    if scale is None:
        scale = D ** -0.5
    q, k, v = attn_ops._qkv_heads(p, x, num_heads)
    if apply_qk_norm and "q_norm" in p:
        q = nn.layernorm(p["q_norm"], q, eps=qk_norm_eps)
        k = nn.layernorm(p["k_norm"], k, eps=qk_norm_eps)
    attn = jnp.einsum("...sd,...td->...st", q, k,
                      preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("...st,...td->...sd", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    out = jnp.moveaxis(out, -3, -2).reshape(*lead, S, C)
    return nn.linear(p["proj"], out), attn


def _scale_block_probs(p, x, num_heads, ln_eps=1e-6, scale=None,
                       apply_qk_norm=False):
    """Eval-mode ScaleBlock (scale_block_apply's XLA composition) with
    attention probabilities. x: [B, 49, S, C]."""
    h, probs = _mha_probs(p["attn"], nn.layernorm(p["norm1"], x, ln_eps),
                          num_heads, scale=scale,
                          apply_qk_norm=apply_qk_norm)
    x = x + _maybe_ls(p, "ls1", h)
    h = nn.mlp(p["mlp"], nn.layernorm(p["norm2"], x, ln_eps))
    x = x + _maybe_ls(p, "ls2", h)
    return x, probs


def _rollout(mats):
    """Chain head-averaged attention matrices [B, N, N] (layer order) into
    the end-to-end mixing operator. The patch blocks have no residual
    stream, so the bare product is exact (no 0.5*(A+I) correction)."""
    out = mats[0]
    for m in mats[1:]:
        out = jnp.einsum("bij,bjk->bik", m, out)
    return out


def multiscaleformer_maps(tfm, params, tokens):
    """Walk a MultiscaleFormer (release core) over prepared tokens
    [B, 49, S+1, C] collecting attention maps. Returns (logits, maps).
    Both stacks run as lax.scan with stacked per-block aux outputs —
    ONE compiled block body per stack regardless of depth (the
    diagnostic path stays jit-compact at the production depth 12)."""
    from jax import lax

    nh = tfm.num_heads
    x = tokens + params["pos_embed_for_scale"].astype(tokens.dtype)

    def sbody(carry, blk):
        # scale pass never applies q/k norms (Q9 / AttentionForScale)
        y, pr = _scale_block_probs(blk, carry, nh, tfm.ln_eps,
                                   apply_qk_norm=False)
        return y, jnp.mean(pr, axis=2)[:, :, 0, :]             # [B, 49, S+1]

    x, scale_rows = lax.scan(sbody, x, params["scale_blocks"])
    maps = {"scale_attn": jnp.moveaxis(scale_rows, 0, 1)
            .astype(jnp.float32)}                              # [B, depth, ...]

    if not tfm.patch_attn:
        cls = jnp.mean(x[:, :, 0, :], axis=1)
        return nn.linear(params["head"], cls), maps

    B = x.shape[0]
    t = x[:, :, 0, :]
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype),
                           (B, 1, tfm.embed_dim))
    t = jnp.concatenate([cls, t], axis=1) + params["pos_embed"].astype(x.dtype)

    def pbody(carry, blk):
        # AttentionForPatch DOES apply q/k norms when present
        # (scale_attention.py:201); PatchBlock = bare attention, chained
        y, pr = _mha_probs(blk["attn"], carry, nh, apply_qk_norm=True)
        return y, jnp.mean(pr, axis=1)                         # [B, 50, 50]

    t, mixing = lax.scan(pbody, t, params["patch_blocks"])
    maps["patch_attn"] = jnp.moveaxis(mixing[:, :, 0, :], 0, 1) \
        .astype(jnp.float32)                                   # [B, depth, 50]
    eye = jnp.broadcast_to(jnp.eye(mixing.shape[-1], dtype=mixing.dtype),
                           (B, mixing.shape[-1], mixing.shape[-1]))
    roll, _ = lax.scan(
        lambda acc, m: (jnp.einsum("bij,bjk->bik", m, acc), None),
        eye, mixing)
    roll = roll[:, 0, 1:]                                      # [B, 49]
    maps["region_rollout"] = (
        roll / jnp.maximum(jnp.sum(roll, -1, keepdims=True), 1e-12)
    ).astype(jnp.float32)

    cls_out = t[:, 0, :]
    _ = nn.layernorm(params["fc_norm"], cls_out, tfm.ln_eps)  # Q7: discarded
    return nn.linear(params["head"], cls_out), maps


def multiscaletransformer_maps(tfm, params, tokens):
    """Walk a MultiscaleTransformer (legacy core, Q4/Q12) collecting maps.
    The quirky region pass runs block 0 then block depth-1 only, so
    patch_attn has 2 rows and the rollout chains those two matrices."""
    from jax import lax

    nh = tfm.num_heads
    x = tokens + params["pos_embed_for_scale"].astype(tokens.dtype)

    def sbody(carry, blk):
        view = {"norm1": blk["norm1"], "attn": blk["attn1"],
                "norm2": blk["norm2"], "mlp": blk["mlp"]}
        if "ls1" in blk:
            view["ls1"], view["ls2"] = blk["ls1"], blk["ls2"]
        y, pr = _scale_block_probs(view, carry, nh, tfm.ln_eps,
                                   scale=tfm.attn_scale)       # Q12 scale
        return y, jnp.mean(pr, axis=2)[:, :, 0, :]

    x, scale_rows = lax.scan(sbody, x, params["blocks"])
    maps = {"scale_attn": jnp.moveaxis(scale_rows, 0, 1)
            .astype(jnp.float32)}

    B = x.shape[0]
    t = x[:, :, 0, :]
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype),
                           (B, 1, tfm.embed_dim))
    t = jnp.concatenate([cls, t], axis=1) + params["pos_embed"].astype(x.dtype)
    cls_rows, mixing = [], []
    blocks = ([0] if tfm.depth == 1 else [0, tfm.depth - 1])   # Q4
    for i in blocks:
        blk = _slice_block(params["blocks"], i)
        # forward_with_region: attn2, shared Q12 scale, q/k norms carried
        # but never applied (multiscale_attn.py:195-219)
        t, pr = _mha_probs(blk["attn2"], t, nh, scale=tfm.attn_scale,
                           apply_qk_norm=False)
        hm = jnp.mean(pr, axis=1)
        cls_rows.append(hm[:, 0, :])
        mixing.append(hm)
    maps["patch_attn"] = jnp.stack(cls_rows, axis=1).astype(jnp.float32)
    roll = _rollout(mixing)[:, 0, 1:]
    maps["region_rollout"] = (
        roll / jnp.maximum(jnp.sum(roll, -1, keepdims=True), 1e-12)
    ).astype(jnp.float32)

    cls_out = nn.layernorm(params["norm"], t[:, 0, :], tfm.ln_eps)
    return nn.linear(params["head"], cls_out), maps


def attention_maps(model, params, x):
    """Full-model attention maps for a DuoFormer-family model.

    x: [B, 224, 224, 3] normalized (model compute dtype). Returns
    (logits [B, num_classes] f32, maps dict — see module docstring).
    jit-friendly (static shapes, python loops unroll at trace time;
    depth*2 distinct block bodies — a diagnostic path, not the
    production scan)."""
    from .duoformer import DuoFormer, DuoFormerLegacy

    if isinstance(model, DuoFormer):
        feats = model.features(params, x, train=False)
        if model.scale_token == "channel":
            token = model.channel_proj.apply(params["channel_proj"], feats)
        else:
            token = jnp.broadcast_to(
                params["scale_token"].astype(x.dtype),
                (x.shape[0], 49, 1, model.proj_dim))
        proj = model.projection.apply(
            params["projection"],
            {s: feats[s] for s in model.projection.stages})
        tokens = regroup.regroup(proj, regroup.stages_for(model.num_layers))
        tokens = jnp.concatenate([token, tokens], axis=2)
        logits, maps = multiscaleformer_maps(model.transformer, params["transformer"],
                                             tokens)
    elif isinstance(model, DuoFormerLegacy):
        feats = model.resnet.apply(params["backbone"], x, train=False)
        token = model.channel_proj.apply(params["channel_proj"], feats)
        proj = model.projection.apply(
            params["projection"],
            {s: feats[s] for s in model.projection.stages})
        tokens = regroup.regroup(proj, regroup.stages_for(model.num_layers))
        tokens = jnp.concatenate([token, tokens], axis=2)
        logits, maps = multiscaletransformer_maps(
            model.transformer, params["transformer"], tokens)
        logits = jnp.atleast_2d(logits)   # undo Q13's squeeze for the API
    else:
        raise ValueError(
            f"attention maps support the DuoFormer families, not "
            f"{type(model).__name__}")
    return logits.astype(jnp.float32), maps


def region_grid(maps_or_rollout, grid: int = 7):
    """[.., 49] region vector(s) -> [.., grid, grid] row-major spatial map
    over the tile (the 49 regions are the backbone's 7x7 coarsest stage)."""
    r = jnp.asarray(maps_or_rollout)
    return r.reshape(*r.shape[:-1], grid, grid)
