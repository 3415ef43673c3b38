"""Inference/serving front-end.

One object that owns everything the serving path needs: folded-BN params,
bf16 compute, a single jitted (preprocess + forward) step, optional mesh
sharding, and optional torch-checkpoint loading. This is the deployable
counterpart of the reference's `evaluation()` loop (main_toy.py:39-54).
"""

from __future__ import annotations



import jax
import jax.numpy as jnp

from .data import pipeline as data_lib
from .models.duoformer import fold_for_inference
from .parallel import mesh as mesh_lib


class Predictor:
    def __init__(self, model, params, mesh=None, dtype=jnp.bfloat16,
                 fold: bool = True, preprocess: bool = True,
                 quantize: bool = False):
        """model: any framework model with .apply(params, x, train=False).
        params: f32 param tree (converted or trained). fold: fold BNs for
        inference (exact; DuoFormer-family models only). preprocess: accept
        raw uint8 NHWC tiles and normalize on device.

        Multi-chip note: batch-sharded inference through the Pallas
        megakernels is CORRECT (verified exact on the virtual mesh); if
        profiling on a real pod shows the partitioner gathering around
        the kernels, force the XLA path with DUOFORMER_MEGAFUSE=0 /
        DUOFORMER_FUSED_ATTN=0 and compare."""
        self.model = model
        self.mesh = mesh
        self.dtype = dtype
        if fold:
            try:
                params = fold_for_inference(params)
            except (KeyError, TypeError):
                pass   # non-DuoFormer param tree: serve as-is
        if quantize:
            # opt-in int8 (a8w8) serving: every transformer GEMM (MLP
            # fc1/fc2 + attention qkv/proj in both stacks) runs on the
            # int8 MXU path; bounded logit drift (tests/test_int8.py);
            # the bf16 path remains the parity-tested default
            from .ops.quantize import (quantize_attention_weights,
                                       quantize_mlp_weights)
            params = quantize_attention_weights(quantize_mlp_weights(params))
        tp_active = (mesh is not None
                     and mesh.shape.get(mesh_lib.MODEL_AXIS, 1) > 1)
        if mesh is not None:
            if tp_active:
                # Megatron layout over the model axis; the fused kernels
                # (bf16 or int8) run per model-shard via shard_map
                from .parallel import tp as tp_lib
                params = tp_lib.shard_params_tp(mesh, params)
            else:
                params = mesh_lib.replicate(mesh, params)
        self.params = params
        self._bsh = mesh_lib.batch_sharding(mesh) if mesh is not None else None

        def fwd(p, x):
            if preprocess:
                x = data_lib.preprocess_tiles(x, dtype=dtype)
            else:
                x = x.astype(dtype)
            if tp_active:
                from .ops import attention as attn_ops
                with attn_ops.tp_fused_path(mesh):
                    return self.model.apply(p, x, train=False)
            return self.model.apply(p, x, train=False)

        kwargs = {}
        if mesh is not None:
            kwargs["out_shardings"] = mesh_lib.replicated(mesh)
        self._fwd = jax.jit(fwd, **kwargs)

    def __call__(self, tiles):
        """tiles: [B, 224, 224, 3] uint8 (or float if preprocess=False) ->
        logits [B, num_classes] (device array; np.asarray to fetch)."""
        if self._bsh is not None:
            tiles = jax.device_put(tiles, self._bsh)
        return self._fwd(self.params, tiles)

    def predict_proba(self, tiles):
        return jax.nn.softmax(self(tiles).astype(jnp.float32), axis=-1)


def from_torch_checkpoint(model, path: str, mesh=None, dtype=jnp.bfloat16,
                          legacy: bool = False) -> Predictor:
    """Build a Predictor straight from a reference torch checkpoint
    (state_dict file or the whole-object Q14 pickle)."""
    from .utils import torch_convert as tc

    sd = tc.state_dict_from_reference_checkpoint(path)
    conv = tc.convert_duoformer_legacy if legacy else tc.convert_duoformer
    params = tc.to_jax(conv(sd, model))
    return Predictor(model, params, mesh=mesh, dtype=dtype)
