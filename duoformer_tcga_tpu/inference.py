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

        def fwd(p, x, **apply_kwargs):
            if preprocess:
                x = data_lib.preprocess_tiles(x, dtype=dtype)
            else:
                x = x.astype(dtype)
            if tp_active:
                from .ops import attention as attn_ops
                with attn_ops.tp_fused_path(mesh):
                    return self.model.apply(p, x, train=False, **apply_kwargs)
            return self.model.apply(p, x, train=False, **apply_kwargs)

        kwargs = {}
        if mesh is not None:
            kwargs["out_shardings"] = mesh_lib.replicated(mesh)
        self._fwd = jax.jit(fwd, **kwargs)
        self._raw_fwd, self._jit_kwargs = fwd, kwargs
        self._fwd_embed = None
        self._fwd_attn = None
        self._fwd_tta = None
        self._quantized = quantize
        self._preprocess = preprocess

    def __call__(self, tiles):
        """tiles: [B, 224, 224, 3] uint8 (or float if preprocess=False) ->
        logits [B, num_classes] (device array; np.asarray to fetch)."""
        if self._bsh is not None:
            tiles = jax.device_put(tiles, self._bsh)
        return self._fwd(self.params, tiles)

    def predict_proba(self, tiles, tta: bool = False,
                      temperature: float = 1.0):
        """Class probabilities [B, num_classes].

        tta=True: D4 test-time augmentation — average the softmax over
        the 8 exact dihedral symmetries of each tile (histopathology has
        no canonical orientation; the standard cheap accuracy/calibration
        boost, 8x compute). One jit; transforms are pixel permutations.
        temperature: divide logits by T before the softmax (temperature
        scaling, Guo et al. 2017 — fit T with train.fit_temperature /
        `cli eval --calibrate`; 1.0 = raw)."""
        if not tta:
            logits = self(tiles).astype(jnp.float32)
            return jax.nn.softmax(logits / temperature, axis=-1)
        if self._fwd_tta is None:
            def fwd_tta(p, x, t):
                acc = 0.0
                for code in range(8):
                    logits = self._raw_fwd(
                        p, data_lib.d4_transform(x, code))
                    acc = acc + jax.nn.softmax(
                        logits.astype(jnp.float32) / t, axis=-1)
                return acc / 8.0
            self._fwd_tta = jax.jit(fwd_tta, **self._jit_kwargs)
        if self._bsh is not None:
            tiles = jax.device_put(tiles, self._bsh)
        return self._fwd_tta(self.params, tiles, jnp.float32(temperature))

    def attention_maps(self, tiles):
        """tiles -> (logits [B, num_classes] f32, maps dict): head-averaged
        attention maps from a diagnostic forward on the XLA path (the
        fused kernels never materialize attention probabilities). Keys:
        scale_attn [B, depth, 49, S+1], patch_attn, region_rollout
        [B, 49] — see models/interpret.py. DuoFormer families only;
        int8-quantized predictors can't (the diagnostic path reads the
        bf16 weights)."""
        if self._quantized:
            raise ValueError("attention maps need the bf16 weights — "
                             "build the Predictor without quantize=True")
        if self._fwd_attn is None:
            from .models.interpret import attention_maps as _maps

            def fwd(p, x):
                if self._preprocess:
                    x = data_lib.preprocess_tiles(x, dtype=self.dtype)
                else:
                    x = x.astype(self.dtype)
                return _maps(self.model, p, x)

            self._fwd_attn = jax.jit(fwd, **self._jit_kwargs)
        if self._bsh is not None:
            tiles = jax.device_put(tiles, self._bsh)
        return self._fwd_attn(self.params, tiles)

    def embed(self, tiles):
        """tiles -> (logits [B, num_classes], embeddings [B, embed_dim]) in
        ONE forward. The embedding is the pre-head CLS — the standard
        per-tile representation for slide-level MIL aggregation (reference
        analog: get_features taps, model_wo_extra_params.py:214-224, which
        stop at the backbone; here the full DuoFormer representation).
        DuoFormer-family models only (apply must accept with_embedding)."""
        if self._fwd_embed is None:
            import functools
            self._fwd_embed = jax.jit(
                functools.partial(self._raw_fwd, with_embedding=True),
                **self._jit_kwargs)
        if self._bsh is not None:
            tiles = jax.device_put(tiles, self._bsh)
        return self._fwd_embed(self.params, tiles)


def export_serving_artifact(path: str, params, meta: dict,
                            quantize: bool = False) -> dict:
    """Write a standalone serving artifact: BN-folded (and optionally
    int8-quantized) params as a flat npz plus a JSON `__meta__` entry
    (model config + format flags). `cli predict --params=<npz>` serves it
    without the training checkpoint or re-folding — the deployment
    hand-off the reference lacks entirely (it re-pickles whole modules,
    quirk Q14). Returns the meta actually written."""
    import json

    import numpy as np

    from .utils.checkpoint import save_params_npz

    try:
        params = fold_for_inference(params)
        folded = True
    except (KeyError, TypeError):
        folded = False      # non-DuoFormer tree: export as-is
    if quantize:
        from .ops.quantize import (quantize_attention_weights,
                                   quantize_mlp_weights)
        params = quantize_attention_weights(quantize_mlp_weights(params))

    # record which tree levels are lists — the flat npz writes list
    # indices and dict keys identically, and some models keep digit-keyed
    # DICTS, so load-time reconstruction needs this explicitly
    list_paths = []

    def _walk(node, prefix=""):
        if isinstance(node, dict):
            for k, v in node.items():
                _walk(v, f"{prefix}{k}/")
        elif isinstance(node, (list, tuple)):
            list_paths.append(prefix[:-1])
            for i, v in enumerate(node):
                _walk(v, f"{prefix}{i}/")

    _walk(params)
    meta = dict(meta, folded=folded, quantized=bool(quantize),
                lists=sorted(list_paths), format_version=1)
    save_params_npz(path, params)
    # append the meta entry to the zip (np.savez would need the whole
    # tree re-passed; a second write keyed __meta__ is simpler)
    data = dict(np.load(path))
    data["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **data)
    return meta


def load_serving_artifact(path: str):
    """-> (params, meta) from export_serving_artifact's npz."""
    import json

    import numpy as np

    from .utils.checkpoint import load_params_npz_flat

    raw = np.load(path)
    meta = {}
    if "__meta__" in raw.files:
        meta = json.loads(bytes(raw["__meta__"].tobytes()).decode())
    params = load_params_npz_flat(path)
    params.pop("__meta__", None)

    # restore levels that were lists at export time (deepest first, so
    # nested lists convert bottom-up)
    for path_ in sorted(meta.get("lists", []), key=len, reverse=True):
        parts = path_.split("/")
        node = params
        for p in parts[:-1]:
            node = node[p]
        d = node[parts[-1]]
        node[parts[-1]] = [d[str(i)] for i in range(len(d))]
    return params, meta


def from_serving_artifact(model, path: str, mesh=None,
                          dtype=jnp.bfloat16) -> Predictor:
    """Build a Predictor from an exported artifact (already folded /
    quantized — no further transformation applied)."""
    params, _meta = load_serving_artifact(path)
    return Predictor(model, params, mesh=mesh, dtype=dtype, fold=False,
                     quantize=False)


def from_torch_checkpoint(model, path: str, mesh=None, dtype=jnp.bfloat16,
                          legacy: bool = False) -> Predictor:
    """Build a Predictor straight from a reference torch checkpoint
    (state_dict file or the whole-object Q14 pickle)."""
    from .utils import torch_convert as tc

    sd = tc.state_dict_from_reference_checkpoint(path)
    conv = tc.convert_duoformer_legacy if legacy else tc.convert_duoformer
    params = tc.to_jax(conv(sd, model))
    return Predictor(model, params, mesh=mesh, dtype=dtype)
