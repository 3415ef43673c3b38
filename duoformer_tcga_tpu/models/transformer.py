"""DuoFormer transformer cores, TPU-first.

Reimplements the behavior of the reference's three transformer stacks
(/root/reference/models/scale_attention.py, multi_vision_transformer.py,
multiscale_attn.py) as pure functions over stacked per-depth parameter
pytrees, iterated with `lax.scan` so XLA compiles one block body regardless
of depth. All shapes are static; all control flow is trace-time.

Stacks:
  * MultiscaleFormer  — 12 ScaleBlocks then 12 chained PatchBlocks; the
    release-variant core (scale_attention.py:239-344).
  * ScaleFormer       — scale-attention-only stack (scale_attention.py:96-170).
  * MultiscaleTransformer — MultiscaleBlock stack with the block-11-only
    region pass (multi_vision_transformer.py:19-171).

Reproduced reference quirks (SURVEY.md register):
  * Q7: MultiscaleFormer computes fc_norm(cls) and DISCARDS it; the head
    sees the un-normalized CLS (scale_attention.py:341-343).
  * Q4: MultiscaleTransformer's region pass never feeds block i's output to
    block i+1; only block 11's CLS reaches the head
    (multi_vision_transformer.py:151-158). Blocks 1-10 of that pass are
    dead compute in the reference; we compute only block 0 and block 11,
    which is bitwise-identical output without the waste.
  * Q12: MultiscaleTransformer attention uses scale = 2*dim**-0.5 for BOTH
    passes (multiscale_attn.py:142,212); MultiscaleFormer uses the standard
    head_dim**-0.5.
  * Q6 (fixed): the reference sets fea_dim=21 for scales==2
    (scale_attention.py:300) which cannot broadcast against the actual 6
    tokens; we compute num_scale_tokens = 1 + sum(4^i) correctly.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import attention as attn_ops
from ..ops import initializers as init
from ..ops import nn


def num_scale_tokens(scales: int) -> int:
    """1 scale/cls token + 4^0 + ... + 4^(scales-1) pyramid tokens.

    {1:2, 2:6, 3:22, 4:86} — matches the reference's fea_dim table except
    the scales==2 typo (Q6)."""
    return 1 + sum(4 ** i for i in range(scales))


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def scale_block_init(key, dim, num_heads, mlp_ratio=4.0, qkv_bias=True,
                     qk_norm=False, init_values=None, dtype=jnp.float32):
    """ScaleBlock: pre-norm attention + MLP with optional LayerScale
    (scale_attention.py:48-93)."""
    k1, k2 = jax.random.split(key)
    p = {
        "norm1": nn.layernorm_init(dim, dtype),
        "attn": attn_ops.attention_init(k1, dim, num_heads, qkv_bias, qk_norm, dtype),
        "norm2": nn.layernorm_init(dim, dtype),
        "mlp": nn.mlp_init(k2, dim, int(dim * mlp_ratio), scheme="vit", dtype=dtype),
    }
    if init_values is not None:
        p["ls1"] = {"gamma": jnp.full((dim,), init_values, dtype)}
        p["ls2"] = {"gamma": jnp.full((dim,), init_values, dtype)}
    return p


def _maybe_ls(p, name, x):
    if name in p:
        return x * p[name]["gamma"].astype(x.dtype)
    return x


_megafuse_logged: set = set()


def _megafuse_fallback(reason: str) -> bool:
    """Log (once per distinct reason per process) why a block fell off the
    megakernel path onto the XLA composition, then return False. Mirrors
    train._warn_tp_fused_disabled — silent perf cliffs cost benchmarking
    time (VERDICT r2 weak #7)."""
    if reason not in _megafuse_logged:
        _megafuse_logged.add(reason)
        import logging
        logging.getLogger("duoformer").info(
            "megakernels disabled for this block shape: %s "
            "(XLA composition used instead)", reason)
    return False


def _can_megafuse(p, attn_drop, proj_drop, drop_path, train, C, num_heads,
                  apply_qk_norm=True, mlp_drop=0.0):
    """Eligibility for the fused attention/MLP megakernels. Round 3:
    active dropout and LayerScale no longer disqualify — they dispatch to
    the reg kernel instantiations (in-kernel hash-counter dropout +
    LayerScale epilogue, ops/pallas_attention.py reg section), which keep
    the reference's real training hyperparameters (legacy attn_drop=0.1 +
    LayerScale, release proj_drop_rate>0) on the fast path. Remaining
    disqualifiers: APPLIED qk-norm (carried-but-unused Q9 weights stay
    eligible), active DropPath, non-lane-aligned dims, TP/int8 combined
    with reg features (those kernels have no dropout/gamma epilogues)."""
    if attn_ops._FORCE_XLA:      # TP tracing: kernels cannot partition
        return False
    needs_reg = ("ls1" in p) or (train and (attn_drop > 0.0
                                            or proj_drop > 0.0
                                            or mlp_drop > 0.0))
    if "w_q" in p.get("attn", {}).get("qkv", {}):
        # int8 serving weights are fused-only; the int8 kernels carry no
        # LayerScale epilogue (quantize.py refuses LayerScale blocks)
        if "ls1" in p:
            return _megafuse_fallback("int8 weights on a LayerScale block")
        return True
    if apply_qk_norm and "q_norm" in p.get("attn", {}):
        return _megafuse_fallback("applied q/k-norm (no kernel support)")
    if needs_reg and attn_ops._TP_MESH is not None:
        return _megafuse_fallback(
            "tensor-parallel shard_map kernels have no dropout/LayerScale "
            "epilogues")
    if train and not (isinstance(drop_path, (int, float))
                      and drop_path == 0.0):
        return _megafuse_fallback("active stochastic depth (drop_path > 0)")
    if C % 128 != 0 or C % num_heads != 0:
        return _megafuse_fallback(
            f"embed_dim {C} not divisible by 128 lanes / {num_heads} heads")
    import os
    env = os.environ.get("DUOFORMER_MEGAFUSE")
    if env == "0":
        return False
    if env == "1":
        return True
    return attn_ops._use_fused(p.get("attn", {}), 0.0, False, C,
                               apply_qk_norm)


def _use_unrolled_bwd(stacked, train, drop_rate, remat, C, num_heads):
    """Eligibility for the scanned-forward / unrolled-backward stack
    (ops/stack_bwd.py): the plain megafused configuration only — the
    hand-rolled backward reuses the per-block fused backward internals,
    so anything that changes the block's vjp (reg dropout/LayerScale,
    int8, TP, XLA fallback, MLP recompute mode, remat) must stay on the
    generic scan path. Knob: DUOFORMER_UNROLL_BWD — default OFF: on this
    environment's AOT compile service any backward with >=3 distinct
    block bodies is rejected (HTTP 500) and the 2-body grouping measured
    slower than the scan (probes/_probe_r3_groupbwd.py); enable on
    toolchains that compile the unrolled graph (42.6 ms/step win on the
    stack in isolation, docs/performance.md)."""
    if os.environ.get("DUOFORMER_UNROLL_BWD", "0") != "1":
        return False
    if remat or (train and drop_rate > 0.0):
        return False
    if "ls1" in stacked:
        return False                       # LayerScale -> reg kernels
    if "w_q" in stacked.get("attn", {}).get("qkv", {}):
        return False                       # int8 serving weights
    if attn_ops._FORCE_XLA or attn_ops._TP_MESH is not None:
        return False
    if C % 128 != 0 or C % num_heads != 0:
        return False
    from ..ops import pallas_attention as pa
    if not (pa._use_pallas_bwd() and pa._mlp_save_hidden()):
        return False
    # scale stacks never APPLY qk-norm (Q9 carried weights stay eligible)
    return attn_ops._use_fused(jax.tree.map(lambda a: a[0],
                                            stacked.get("attn", {})),
                               0.0, train, C, apply_qk_norm=False)


def _apply_stack_unrolled_bwd(stacked, x, num_heads, ln_eps):
    """Run a ScaleBlock stack through ops/stack_bwd (scanned forward,
    python-unrolled backward: the scan serializes each block's weight-grad
    GEMMs with the backward-kernel chain, measured 42.6 ms/step at B=256 —
    docs/performance.md round-3 roofline)."""
    from ..ops import stack_bwd
    *lead, S, C = x.shape
    n_seg = 1
    for d in lead:
        n_seg *= d
    w = stack_bwd.stack_weights(stacked, x.dtype)
    head_dim = C // num_heads
    out = stack_bwd.fused_stack_residual(
        x.reshape(n_seg, S, C), w, num_heads, S, head_dim ** -0.5, ln_eps)
    return out.reshape(*lead, S, C)


def scale_block_apply(p, x, num_heads, scale=None, ln_eps=1e-6,
                      attn_drop=0.0, proj_drop=0.0, drop_path=0.0,
                      rng=None, train=False, mlp_drop=None,
                      apply_qk_norm=True):
    """x: [B, R, S, C] -> [B, R, S, C]. drop_path may be a traced scalar
    (per-block stochastic-depth rate).

    mlp_drop defaults to proj_drop (timm Block semantics); the DuoFormer
    model families pass it explicitly because the reference's Q9
    positional-arg bug decouples the attention proj dropout (always 0)
    from the MLP dropout (proj_drop_rate). apply_qk_norm=False carries
    q_norm/k_norm weights without applying them (AttentionForScale.forward
    never calls them, scale_attention.py:28-45)."""
    if mlp_drop is None:
        mlp_drop = proj_drop
    r1 = r2 = r3 = r4 = None
    if train and rng is not None:
        r1, r2, r3, r4 = jax.random.split(rng, 4)
    *lead, S, C = x.shape
    if _can_megafuse(p, attn_drop, proj_drop, drop_path,
                     train, C, num_heads, apply_qk_norm, mlp_drop):
        # whole attention branch (LN1 -> qkv -> attn -> proj -> +x) fused
        from ..ops import pallas_attention as pa
        n_seg = 1
        for d in lead:
            n_seg *= d
        attn_p = p["attn"]
        head_dim = C // num_heads
        # Q12: legacy MultiscaleTransformer passes scale=2*dim**-0.5; the
        # kernels take any static scale
        kscale = float(scale) if scale is not None else head_dim ** -0.5
        if attn_ops._TP_MESH is not None and "w_q" in attn_p["qkv"]:
            # int8 serving under head/hidden-split TP: the rectangular
            # int8 megakernels run per model-shard (parallel/tp_fused.py)
            from ..parallel import tp_fused
            mesh = attn_ops._TP_MESH
            mlp_p = p["mlp"]
            hidden = mlp_p["fc1"]["w_q"].shape[-1]
            x = tp_fused.attention_branch_tp_int8(
                mesh, x.reshape(n_seg, S, C), p["norm1"]["scale"],
                p["norm1"]["bias"], attn_p["qkv"]["w_q"],
                attn_p["qkv"]["w_scale"],
                attn_p["qkv"].get("b", jnp.zeros((3 * C,), x.dtype)),
                attn_p["proj"]["w_q"], attn_p["proj"]["w_scale"],
                attn_p["proj"].get("b", jnp.zeros((C,), x.dtype)),
                num_heads, S, kscale, ln_eps).reshape(*lead, S, C)
            return tp_fused.mlp_branch_tp_int8(
                mesh, x.reshape(n_seg * S, C), p["norm2"]["scale"],
                p["norm2"]["bias"], mlp_p["fc1"]["w_q"],
                mlp_p["fc1"]["w_scale"],
                mlp_p["fc1"].get("b", jnp.zeros((hidden,), x.dtype)),
                mlp_p["fc2"]["w_q"], mlp_p["fc2"]["w_scale"],
                mlp_p["fc2"].get("b", jnp.zeros((C,), x.dtype)),
                ln_eps).reshape(*lead, S, C)
        if attn_ops._TP_MESH is not None:
            # head/hidden-split TP: run both megakernels per model-shard
            # via shard_map (parallel/tp_fused.py) — one psum per branch
            from ..parallel import tp_fused
            mesh = attn_ops._TP_MESH
            mlp_p = p["mlp"]
            hidden = mlp_p["fc1"]["w"].shape[-1]
            x = tp_fused.attention_branch_tp(
                mesh, x.reshape(n_seg, S, C), p["norm1"]["scale"],
                p["norm1"]["bias"], attn_p["qkv"]["w"].astype(x.dtype),
                attn_p["qkv"].get("b", jnp.zeros((3 * C,), x.dtype)),
                attn_p["proj"]["w"].astype(x.dtype),
                attn_p["proj"].get("b", jnp.zeros((C,), x.dtype)),
                num_heads, S, kscale, ln_eps).reshape(*lead, S, C)
            return tp_fused.mlp_branch_tp(
                mesh, x.reshape(n_seg * S, C), p["norm2"]["scale"],
                p["norm2"]["bias"], mlp_p["fc1"]["w"].astype(x.dtype),
                mlp_p["fc1"].get("b", jnp.zeros((hidden,), x.dtype)),
                mlp_p["fc2"]["w"].astype(x.dtype),
                mlp_p["fc2"].get("b", jnp.zeros((C,), x.dtype)),
                ln_eps).reshape(*lead, S, C)
        if "w_q" in attn_p["qkv"]:
            # opt-in int8 serving weights (ops/quantize.py): a8w8 qkv/proj
            x = pa.fused_attention_residual_int8(
                x.reshape(n_seg, S, C), p["norm1"]["scale"],
                p["norm1"]["bias"],
                attn_p["qkv"]["w_q"], attn_p["qkv"]["w_scale"],
                attn_p["qkv"].get("b", jnp.zeros((3 * C,), x.dtype)),
                attn_p["proj"]["w_q"], attn_p["proj"]["w_scale"],
                attn_p["proj"].get("b", jnp.zeros((C,), x.dtype)),
                num_heads, S, kscale, ln_eps).reshape(*lead, S, C)
        else:
            # reg instantiation when the block has LayerScale or an active
            # dropout rate: in-kernel hash-counter dropout + gamma epilogue
            eff_attn = attn_drop if (train and r1 is not None) else 0.0
            eff_proj = proj_drop if (train and r1 is not None) else 0.0
            args = (x.reshape(n_seg, S, C), p["norm1"]["scale"],
                    p["norm1"]["bias"],
                    attn_p["qkv"]["w"].astype(x.dtype),
                    attn_p["qkv"].get("b", jnp.zeros((3 * C,), x.dtype)),
                    attn_p["proj"]["w"].astype(x.dtype),
                    attn_p["proj"].get("b", jnp.zeros((C,), x.dtype)))
            if "ls1" in p or eff_attn > 0.0 or eff_proj > 0.0:
                gamma1 = (p["ls1"]["gamma"] if "ls1" in p
                          else jnp.ones((C,), x.dtype))
                seed_a = (jax.random.randint(r1, (), -2**31, 2**31 - 1,
                                             jnp.int32)
                          if r1 is not None else jnp.int32(0))
                x = pa.fused_attention_residual_reg(
                    *args, gamma1, seed_a, num_heads, S, kscale, ln_eps,
                    True, True, eff_attn, eff_proj).reshape(*lead, S, C)
            else:
                x = pa.fused_attention_residual(
                    *args, num_heads, S, kscale, ln_eps).reshape(*lead, S, C)
        # MLP half fused too (same eligibility): kills the 4C-wide hidden
        # activation's HBM round-trip
        from ..ops import pallas_attention as pa
        mlp_p = p["mlp"]
        if "w_q" in mlp_p["fc1"]:
            # opt-in int8 serving weights (ops/quantize.py)
            hidden = mlp_p["fc1"]["w_q"].shape[-1]
            return pa.fused_mlp_residual_int8(
                x, p["norm2"]["scale"], p["norm2"]["bias"],
                mlp_p["fc1"]["w_q"], mlp_p["fc1"]["w_scale"],
                mlp_p["fc1"].get("b", jnp.zeros((hidden,), x.dtype)),
                mlp_p["fc2"]["w_q"], mlp_p["fc2"]["w_scale"],
                mlp_p["fc2"].get("b", jnp.zeros((C,), x.dtype)), ln_eps)
        hidden = mlp_p["fc1"]["w"].shape[-1]
        eff_mlp = mlp_drop if (train and r2 is not None) else 0.0
        margs = (x, p["norm2"]["scale"], p["norm2"]["bias"],
                 mlp_p["fc1"]["w"].astype(x.dtype),
                 mlp_p["fc1"].get("b", jnp.zeros((hidden,), x.dtype)),
                 mlp_p["fc2"]["w"].astype(x.dtype),
                 mlp_p["fc2"].get("b", jnp.zeros((C,), x.dtype)))
        if "ls2" in p or eff_mlp > 0.0:
            gamma2 = (p["ls2"]["gamma"] if "ls2" in p
                      else jnp.ones((C,), x.dtype))
            seed_m = (jax.random.randint(r2, (), -2**31, 2**31 - 1,
                                         jnp.int32)
                      if r2 is not None else jnp.int32(0))
            return pa.fused_mlp_residual_reg(
                *margs, gamma2, seed_m, ln_eps, True, eff_mlp)
        return pa.fused_mlp_residual(*margs, ln_eps)
    h = attn_ops.multihead_attention(
        p["attn"], nn.layernorm(p["norm1"], x, ln_eps), num_heads,
        scale=scale, attn_drop=attn_drop, proj_drop=proj_drop, rng=r1,
        train=train, apply_qk_norm=apply_qk_norm)
    x = x + nn.drop_path(_maybe_ls(p, "ls1", h), drop_path, r3, train)
    h = nn.mlp(p["mlp"], nn.layernorm(p["norm2"], x, ln_eps),
               drop=mlp_drop, rng=r2, train=train)
    x = x + nn.drop_path(_maybe_ls(p, "ls2", h), drop_path, r4, train)
    return x


def patch_block_init(key, dim, num_heads, qkv_bias=True, qk_norm=False,
                     dtype=jnp.float32):
    """PatchBlock: bare attention, no residual/MLP (scale_attention.py:214-236)."""
    return {"attn": attn_ops.attention_init(key, dim, num_heads, qkv_bias,
                                            qk_norm, dtype)}


def patch_block_apply(p, x, num_heads, scale=None, attn_drop=0.0,
                      proj_drop=0.0, rng=None, train=False,
                      apply_qk_norm=True):
    """x: [B, N, C] -> [B, N, C] (pure attention, chained).

    Unlike the scale passes, AttentionForPatch.forward DOES apply q/k
    LayerNorms when present (scale_attention.py:201)."""
    return attn_ops.multihead_attention(
        p["attn"], x, num_heads, scale=scale,
        attn_drop=attn_drop, proj_drop=proj_drop, rng=rng, train=train,
        apply_qk_norm=apply_qk_norm)


def multiscale_block_init(key, dim, num_heads, mlp_ratio=4.0, qkv_bias=True,
                          qk_norm=False, init_values=None, dtype=jnp.float32):
    """MultiscaleBlock: one timm-style block owning TWO attention param sets —
    attn1 (qkv1/proj1, scale pass) and attn2 (inherited qkv/proj, region
    pass) (multiscale_attn.py:224-259).

    Q9: the reference's positional-arg misuse creates q/k LayerNorms on the
    INHERITED set (attn2) when attn_drop>0 (multiscale_attn.py:137); qkv1
    never has them. They land in checkpoints but forward_with_region never
    applies them — MultiscaleTransformer carries them unapplied."""
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": nn.layernorm_init(dim, dtype),
        "attn1": attn_ops.attention_init(k1, dim, num_heads, qkv_bias, False, dtype),
        "attn2": attn_ops.attention_init(k2, dim, num_heads, qkv_bias, qk_norm, dtype),
        "norm2": nn.layernorm_init(dim, dtype),
        "mlp": nn.mlp_init(k3, dim, int(dim * mlp_ratio), scheme="vit", dtype=dtype),
    }
    if init_values is not None:
        p["ls1"] = {"gamma": jnp.full((dim,), init_values, dtype)}
        p["ls2"] = {"gamma": jnp.full((dim,), init_values, dtype)}
    return p


# ---------------------------------------------------------------------------
# Depth stacking helpers
# ---------------------------------------------------------------------------

def stack_init(block_init, key, depth, *args, **kwargs):
    """Initialize `depth` independent blocks and stack their params along a
    leading axis for lax.scan iteration."""
    keys = jax.random.split(key, depth)
    return jax.vmap(lambda k: block_init(k, *args, **kwargs))(keys)


def _scan_blocks(apply_fn, stacked, x, rng, train, depth, extras=(),
                 remat=False):
    """Run x through `depth` stacked blocks with lax.scan.

    extras: tuple of [depth, ...] arrays scanned alongside the params and
    passed positionally after the carry (e.g. per-block drop-path rates).
    remat=True wraps the block body in jax.checkpoint (activation
    rematerialization): backward recomputes each block instead of saving
    its activations — O(depth) -> O(1) residual memory, the standard
    FLOPs-for-HBM trade for big batches."""
    if train and rng is not None:
        rngs = jax.random.split(rng, depth)
    else:
        rngs = jnp.zeros((depth, 2), dtype=jnp.uint32)  # unused placeholder

    def body(carry, xs):
        blk, r, *ex = xs
        r = r if train and rng is not None else None
        return apply_fn(blk, carry, *ex, rng=r), None

    if remat:
        body = jax.checkpoint(body)
    x, _ = lax.scan(body, x, (stacked, rngs, *extras),
                    unroll=int(os.environ.get("DUOFORMER_SCAN_UNROLL", "1")))
    return x


def _slice_block(stacked, i):
    return jax.tree.map(lambda a: a[i], stacked)


# ---------------------------------------------------------------------------
# MultiscaleFormer — the release-variant core (scale_attention.py:239-344)
# ---------------------------------------------------------------------------

class MultiscaleFormer:
    """12 ScaleBlocks over [B,49,S,C], then 12 chained PatchBlocks over
    [B,50,C]; head on un-normalized CLS (Q7).

    patch_attn=False skips the patch stack and classifies from the mean of
    the per-region scale tokens (extension — the reference accepts the flag
    but its MultiscaleFormer signature rejects it, model_wo_extra_params.py:105).

    Q9 dropout/qk-norm semantics (timm-0.9.8 positional-arg bug, reproduced
    faithfully — scale_attention.py:25,178 call Attention.__init__ with
    attn_drop landing in qk_norm and proj_drop in attn_drop):
      * q/k per-head LayerNorms are CREATED iff attn_drop_rate > 0 (the
        only live trigger; qk_norm=True/False overrides explicitly);
      * they are APPLIED only by the patch blocks (AttentionForPatch
        applies them, scale_attention.py:201; AttentionForScale does not);
      * the effective attention-matrix dropout rate is proj_drop_rate, the
        attention output-proj dropout is 0, the MLP dropout is
        proj_drop_rate; attn_drop_rate itself is never a dropout rate.
    """

    def __init__(self, depth=12, scales=2, num_heads=12, embed_dim=768,
                 mlp_ratio=4.0, qkv_bias=True, qk_norm=None,
                 proj_drop_rate=0.0, attn_drop_rate=0.0, init_values=None,
                 num_classes=100, num_patches=49, pos_drop_rate=0.0,
                 patch_attn=True, ln_eps=1e-6, remat=False,
                 apply_fc_norm=False, dtype=jnp.float32):
        self.depth = depth
        self.scales = scales
        self.num_heads = num_heads
        self.embed_dim = embed_dim
        self.mlp_ratio = mlp_ratio
        self.qkv_bias = qkv_bias
        # Q9 creation rule: positional-arg bug makes qk_norm truthy exactly
        # when attn_drop_rate > 0.
        self.qk_norm = (attn_drop_rate > 0.0) if qk_norm is None else qk_norm
        self.proj_drop_rate = proj_drop_rate
        self.attn_drop_rate = attn_drop_rate
        self.init_values = init_values
        self.num_classes = num_classes
        self.num_patches = num_patches
        self.pos_drop_rate = pos_drop_rate
        self.patch_attn = patch_attn
        self.ln_eps = ln_eps
        self.remat = remat
        # Q7 fix, OPT-IN: the reference computes fc_norm(cls) and discards
        # it (scale_attention.py:341-343), so the head runs on the raw CLS
        # — which the residual-free patch chain attenuates to ~(0.31)^depth
        # of token scale (~1e-6 at depth 12). That makes FROM-SCRATCH
        # full-size training pathologically slow (the micro-logits drown
        # under the head bias). apply_fc_norm=True applies the LayerNorm
        # the reference created for exactly this purpose. Default False:
        # bit-faithful Q7 for checkpoint parity (released checkpoints were
        # trained elsewhere and carry inert fc_norm params).
        self.apply_fc_norm = apply_fc_norm
        self.dtype = dtype
        self.fea_dim = num_scale_tokens(scales)

    def init(self, key):
        ks, kp, kpe, kpe2, kcls, khead = jax.random.split(key, 6)
        d = self.dtype
        p = {
            "scale_blocks": stack_init(
                scale_block_init, ks, self.depth, self.embed_dim,
                self.num_heads, self.mlp_ratio, self.qkv_bias, self.qk_norm,
                self.init_values, d),
            "patch_blocks": stack_init(
                patch_block_init, kp, self.depth, self.embed_dim,
                self.num_heads, self.qkv_bias, self.qk_norm, d),
            # trunc_normal std 0.036 (scale_attention.py:324-325)
            "pos_embed_for_scale": init.trunc_normal(
                kpe, (1, 1, self.fea_dim, self.embed_dim), std=0.036, dtype=d),
            "pos_embed": init.trunc_normal(
                kpe2, (1, self.num_patches + 1, self.embed_dim), std=0.036, dtype=d),
            # normal std 0.036 (scale_attention.py:326)
            "cls_token": init.normal(kcls, (1, 1, self.embed_dim), std=0.036, dtype=d),
            # fc_norm + head: torch defaults (never timm-re-inited,
            # scale_attention.py:318-320)
            "fc_norm": nn.layernorm_init(self.embed_dim, d),
            "head": nn.linear_init(khead, self.embed_dim, self.num_classes,
                                   scheme="torch", dtype=d),
        }
        return p

    def apply(self, params, x, rng=None, train=False, with_embedding=False):
        """x: [B, 49, S+1, C] (scale token already prepended) -> logits
        [B, num_classes]; with_embedding=True additionally returns the
        pre-head CLS [B, C] (the exact vector the classifier sees — Q7:
        un-normalized, scale_attention.py:341-343) as (logits, cls)."""
        B = x.shape[0]
        nh = self.num_heads
        r_scale = r_patch = r_pos_scale = r_pos_patch = None
        if train and rng is not None:
            # distinct keys for the two pos-dropouts: sharing one key would
            # correlate the scale-stack and patch-stack dropout masks
            r_scale, r_patch, r_pos_scale, r_pos_patch = jax.random.split(rng, 4)

        x = x + params["pos_embed_for_scale"].astype(x.dtype)
        x = nn.dropout(x, self.pos_drop_rate, r_pos_scale, train)

        # Q9 effective rates: attention-matrix dropout = proj_drop_rate,
        # attention proj dropout = 0, MLP dropout = proj_drop_rate; the
        # scale pass never applies q/k norms (AttentionForScale.forward).
        scale_apply = functools.partial(
            scale_block_apply, num_heads=nh, scale=None, ln_eps=self.ln_eps,
            attn_drop=self.proj_drop_rate, proj_drop=0.0,
            mlp_drop=self.proj_drop_rate, apply_qk_norm=False,
            train=train)
        from ..parallel import pp as pp_lib
        if pp_lib._PP_CTX is not None:
            # pipeline parallelism: depth-sharded GPipe over the "pipe"
            # mesh axis (parallel/pp.py); ppermute stage handoffs
            pmesh, pmicro, punroll = pp_lib._PP_CTX
            x = pp_lib.pipeline_stack_apply(
                pmesh, params["scale_blocks"], x, scale_apply,
                microbatches=pmicro, rng=r_scale, train=train,
                remat=self.remat, unroll=punroll)
        elif _use_unrolled_bwd(params["scale_blocks"], train,
                               self.proj_drop_rate, self.remat,
                               self.embed_dim, nh):
            x = _apply_stack_unrolled_bwd(params["scale_blocks"], x, nh,
                                          self.ln_eps)
        else:
            x = _scan_blocks(scale_apply, params["scale_blocks"], x,
                             r_scale, train, self.depth, remat=self.remat)

        if not self.patch_attn:
            cls = jnp.mean(x[:, :, 0, :], axis=1)
            logits = nn.linear(params["head"], cls)
            return (logits, cls) if with_embedding else logits

        # Patch pass: block 0 consumes the 4-D tokens + CLS + pos embed;
        # blocks 1..depth-1 chain over [B, 50, C] (scale_attention.py:335-340).
        tokens = x[:, :, 0, :]                                   # [B, 49, C]
        cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype),
                               (B, 1, self.embed_dim))
        tokens = jnp.concatenate([cls, tokens], axis=1)          # [B, 50, C]
        tokens = tokens + params["pos_embed"].astype(x.dtype)
        tokens = nn.dropout(tokens, self.pos_drop_rate, r_pos_patch, train)

        blk0 = _slice_block(params["patch_blocks"], 0)
        r0 = None
        rest_rng = None
        if train and r_patch is not None:
            r0, rest_rng = jax.random.split(r_patch)
        # Q9 effective rates again; AttentionForPatch DOES apply q/k norms.
        tokens = patch_block_apply(blk0, tokens, nh,
                                   attn_drop=self.proj_drop_rate,
                                   proj_drop=0.0,
                                   rng=r0, train=train)
        rest = jax.tree.map(lambda a: a[1:], params["patch_blocks"])
        patch_apply = functools.partial(
            patch_block_apply, num_heads=nh,
            attn_drop=self.proj_drop_rate, proj_drop=0.0,
            train=train)
        tokens = _scan_blocks(patch_apply, rest, tokens, rest_rng, train,
                              self.depth - 1, remat=self.remat)

        cls = tokens[:, 0, :]
        if self.apply_fc_norm:       # Q7 fix (opt-in, see __init__)
            cls = nn.layernorm(params["fc_norm"], cls, self.ln_eps)
        else:
            _ = nn.layernorm(params["fc_norm"], cls, self.ln_eps)  # Q7:
            # computed and discarded, exactly as the reference does
        logits = nn.linear(params["head"], cls)
        return (logits, cls) if with_embedding else logits


# ---------------------------------------------------------------------------
# ScaleFormer — scale-attention-only stack (scale_attention.py:96-170)
# ---------------------------------------------------------------------------

class ScaleFormer:
    """Prepends its own cls token per region, runs `depth` ScaleBlocks, and
    returns the token at index 1 (Q13 second half: the reference extracts
    x[:, :, 1, :], scale_attention.py:168)."""

    def __init__(self, depth=12, scales=2, num_heads=6, embed_dim=384,
                 mlp_ratio=4.0, qkv_bias=True, qk_norm=None,
                 proj_drop_rate=0.0, attn_drop_rate=0.0, init_values=None,
                 pos_drop_rate=0.0, ln_eps=1e-6, dtype=jnp.float32):
        self.depth = depth
        self.scales = scales
        self.num_heads = num_heads
        self.embed_dim = embed_dim
        self.mlp_ratio = mlp_ratio
        self.qkv_bias = qkv_bias
        # Q9 creation rule (see MultiscaleFormer docstring)
        self.qk_norm = (attn_drop_rate > 0.0) if qk_norm is None else qk_norm
        self.proj_drop_rate = proj_drop_rate
        self.attn_drop_rate = attn_drop_rate
        self.init_values = init_values
        self.pos_drop_rate = pos_drop_rate
        self.ln_eps = ln_eps
        self.dtype = dtype
        self.fea_dim = num_scale_tokens(scales)

    def init(self, key):
        kb, kcls, kpe = jax.random.split(key, 3)
        d = self.dtype
        return {
            "blocks": stack_init(
                scale_block_init, kb, self.depth, self.embed_dim,
                self.num_heads, self.mlp_ratio, self.qkv_bias, self.qk_norm,
                self.init_values, d),
            "cls_token1": init.normal(kcls, (1, 1, 1, self.embed_dim),
                                      std=0.036, dtype=d),
            "pos_embed_for_scale": init.trunc_normal(
                kpe, (1, 1, self.fea_dim, self.embed_dim), std=0.036, dtype=d),
        }

    def apply(self, params, x, rng=None, train=False):
        """x: [B, 49, S, C] -> per-region token [B, 49, C]."""
        B, R = x.shape[0], x.shape[1]
        cls = jnp.broadcast_to(params["cls_token1"].astype(x.dtype),
                               (B, R, 1, self.embed_dim))
        x = jnp.concatenate([cls, x], axis=2)
        x = x + params["pos_embed_for_scale"].astype(x.dtype)
        x = nn.dropout(x, self.pos_drop_rate, rng, train)
        # Q9 effective rates (ScaleBlocks — see MultiscaleFormer docstring)
        scale_apply = functools.partial(
            scale_block_apply, num_heads=self.num_heads, scale=None,
            ln_eps=self.ln_eps, attn_drop=self.proj_drop_rate,
            proj_drop=0.0, mlp_drop=self.proj_drop_rate,
            apply_qk_norm=False, train=train)
        if _use_unrolled_bwd(params["blocks"], train, self.proj_drop_rate,
                             False, self.embed_dim, self.num_heads):
            x = _apply_stack_unrolled_bwd(params["blocks"], x,
                                          self.num_heads, self.ln_eps)
        else:
            x = _scan_blocks(scale_apply, params["blocks"], x, rng, train,
                             self.depth)
        return x[:, :, 1, :]   # index 1, not 0 (reference behavior)


# ---------------------------------------------------------------------------
# MultiscaleTransformer — inherited-ViT core (multi_vision_transformer.py:19-171)
# ---------------------------------------------------------------------------

class MultiscaleTransformer:
    """MultiscaleBlock stack: scale pass through all blocks (full pre-norm
    block with attn1 and scale 2*dim**-0.5, Q12), then the quirky region
    pass (Q4) using attn2, final timm-ViT norm + head, and a squeeze on the
    head output (Q13).

    The inherited timm cls_token/pos_embed keep timm init (normal 1e-6 /
    trunc_normal 0.02)."""

    def __init__(self, depth=12, scales=2, num_heads=6, embed_dim=384,
                 mlp_ratio=4.0, qkv_bias=True, qk_norm=None,
                 drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0,
                 init_values=1e-5, num_classes=1000, num_patches=49,
                 ln_eps=1e-6, remat=False, dtype=jnp.float32):
        self.depth = depth
        self.scales = scales
        self.num_heads = num_heads
        self.embed_dim = embed_dim
        self.mlp_ratio = mlp_ratio
        self.qkv_bias = qkv_bias
        # Q9 creation rule: q/k LayerNorms exist on attn2 iff
        # attn_drop_rate > 0 (MyModel hardcodes 0.1 -> always created,
        # model.py:94); they are never applied (forward_with_region
        # computes qkv manually, multiscale_attn.py:195-219).
        self.qk_norm = (attn_drop_rate > 0.0) if qk_norm is None else qk_norm
        self.drop_rate = drop_rate
        self.attn_drop_rate = attn_drop_rate
        self.drop_path_rate = drop_path_rate
        self.init_values = init_values
        self.num_classes = num_classes
        self.num_patches = num_patches
        self.ln_eps = ln_eps
        self.remat = remat
        self.dtype = dtype
        self.fea_dim = num_scale_tokens(scales)
        # Q12: shared scale for both attention passes.
        self.attn_scale = 2.0 * embed_dim ** -0.5

    def init(self, key):
        kb, kpe, kpe2, kcls, khead = jax.random.split(key, 5)
        d = self.dtype
        return {
            "blocks": stack_init(
                multiscale_block_init, kb, self.depth, self.embed_dim,
                self.num_heads, self.mlp_ratio, self.qkv_bias, self.qk_norm,
                self.init_values, d),
            "pos_embed_for_scale": init.trunc_normal(
                kpe, (1, 1, self.fea_dim, self.embed_dim), std=0.036, dtype=d),
            # timm VisionTransformer inherited params & init
            "pos_embed": init.trunc_normal(
                kpe2, (1, self.num_patches + 1, self.embed_dim), std=0.02, dtype=d),
            "cls_token": init.normal(kcls, (1, 1, self.embed_dim), std=1e-6, dtype=d),
            "norm": nn.layernorm_init(self.embed_dim, d),
            "head": nn.linear_init(khead, self.embed_dim, self.num_classes,
                                   scheme="vit", dtype=d),
        }

    def _region_attn(self, blk, tokens, rng, train):
        """forward_with_region on a [B, 50, C] token set (multiscale_attn.py:205-218).
        Uses attn2 (inherited qkv/proj) with the shared 2*dim**-0.5 scale.

        Q9 effective rates: the inherited self.attn_drop is Dropout(drop_rate)
        (the proj_drop ctor arg shifted into timm's attn_drop slot) and
        self.proj_drop is Dropout(0); q/k norms, when present, are carried
        but NOT applied."""
        return attn_ops.multihead_attention(
            blk["attn2"], tokens, self.num_heads, scale=self.attn_scale,
            attn_drop=self.drop_rate, proj_drop=0.0,
            rng=rng, train=train, apply_qk_norm=False)

    def apply(self, params, x, rng=None, train=False, with_embedding=False):
        """x: [B, 49, S+1, C] -> logits [B, num_classes] (squeezed, Q13).
        with_embedding=True -> (logits, cls_out [B, C]) where cls_out is the
        post-final-norm CLS the head consumes (the embedding is NOT
        squeezed)."""
        B = x.shape[0]
        r_scale = r_region = None
        if train and rng is not None:
            r_scale, r_region = jax.random.split(rng)

        x = x + params["pos_embed_for_scale"].astype(x.dtype)

        # stochastic-depth decay rule (multi_vision_transformer.py:50-52)
        dpr = jnp.linspace(0.0, self.drop_path_rate, self.depth)

        def one_scale_block(blk, h, dp, rng=None):
            # Route through scale_block_apply (attn1 -> attn param view) so
            # the legacy family rides the same megakernel dispatch — incl.
            # the reg kernels for its attn_drop=0.1 + LayerScale regime
            # (model.py:94, multiscale_attn.py:146-148). attn1 never has
            # q/k norms (Q9: only attn2 carries them), so apply_qk_norm's
            # default is inert here.
            view = {"norm1": blk["norm1"], "attn": blk["attn1"],
                    "norm2": blk["norm2"], "mlp": blk["mlp"]}
            if "ls1" in blk:
                view["ls1"] = blk["ls1"]
                view["ls2"] = blk["ls2"]
            dp = dp if self.drop_path_rate else 0.0
            return scale_block_apply(
                view, h, self.num_heads, scale=self.attn_scale,
                ln_eps=self.ln_eps, attn_drop=self.attn_drop_rate,
                proj_drop=self.drop_rate, drop_path=dp, rng=rng,
                train=train, mlp_drop=self.drop_rate)

        x = _scan_blocks(one_scale_block, params["blocks"], x, r_scale,
                         train, self.depth, extras=(dpr,),
                         remat=self.remat)

        # Region pass (Q4): block 0 builds [B,50,C]; the reference then runs
        # blocks 1..11 each on block-0's output, keeping only block 11's CLS.
        tokens = x[:, :, 0, :]
        cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype),
                               (B, 1, self.embed_dim))
        tokens = jnp.concatenate([cls, tokens], axis=1)
        tokens = tokens + params["pos_embed"].astype(x.dtype)
        r0 = rN = None
        if train and r_region is not None:
            r0, rN = jax.random.split(r_region)
        blk0 = _slice_block(params["blocks"], 0)
        tokens = self._region_attn(blk0, tokens, r0, train)
        if self.depth > 1:
            blkN = _slice_block(params["blocks"], self.depth - 1)
            cls_out = self._region_attn(blkN, tokens, rN, train)[:, 0, :]
        else:
            cls_out = tokens[:, 0, :]

        cls_out = nn.layernorm(params["norm"], cls_out, self.ln_eps)
        logits = nn.linear(params["head"], cls_out)
        logits = jnp.squeeze(logits)   # Q13: batch dim squeezed when B == 1
        return (logits, cls_out) if with_embedding else logits
