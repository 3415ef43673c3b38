"""Hermetic StableHLO serving export (jax.export).

Packages the jitted serving step (uint8 tiles -> logits, preprocessing
fused in) as serialized, versioned StableHLO plus the BN-folded
parameters in ONE zip — a compiler-level artifact any matching JAX
runtime can execute WITHOUT this package's Python model code. The
reference has no export story at all: its checkpoints re-pickle whole
torch modules and need the original class definitions importable to even
load (quirk Q14, /root/reference/main_toy.py:139-149).

Design notes (TPU-first):
  * lowered for BOTH "cpu" and "tpu" by default — one artifact serves on
    either; the platform is picked at call time by jax.export.
  * traced with the params as ARGUMENTS, not closed-over constants: the
    MLIR stays tiny (a few hundred KB, no weight constants) and the
    params ride along as a plain npz; this also dodges remote-compile
    payload limits on tunneled devices (see CLAUDE.md env gotchas).
  * traced on the pure-XLA path (ops.attention.force_xla_path): zero
    backend custom-calls means the serialized module sits entirely inside
    jax.export's StableHLO compatibility window. The in-process Predictor
    remains the fused-Pallas fast path; this artifact trades those
    kernels for hermeticity/portability.
  * the params npz reuses the serving-artifact format
    (inference.export_serving_artifact), so the tree the module was
    traced against is byte-identical to what the loader reconstructs.
"""

from __future__ import annotations

import json
import zipfile

import jax
import jax.numpy as jnp

MODULE_NAME = "module.stablehlo"
PARAMS_NAME = "params.npz"
META_NAME = "meta.json"


def export_stablehlo(model, params, path: str, batch_size: int = 32,
                     tile: int = 224, dtype=jnp.bfloat16,
                     platforms=("cpu", "tpu"), meta: dict | None = None) -> dict:
    """Serialize `model.apply` (with fused uint8 preprocessing) to `path`.

    params: f32 training/converted tree — BN-folded here when the model
    family supports it (exact transform, same as Predictor/cli export).
    batch_size: the artifact's static batch — callers pad short batches.
    Returns the meta dict written into the zip."""
    import numpy as np

    from ..data import pipeline as data_lib
    from ..inference import export_serving_artifact, load_serving_artifact
    from ..ops import attention as attn_ops
    from jax import export as jexport

    # write the params half first (folds BNs, records list-valued tree
    # levels), then RELOAD it so the traced tree is exactly the tree the
    # loader will reconstruct. The .npz suffix matters: np.savez appends
    # it to any other extension, orphaning the temp file.
    buf_path = path + ".params.tmp.npz"
    pmeta = export_serving_artifact(buf_path, params,
                                    {} if meta is None else dict(meta),
                                    quantize=False)
    params, _ = load_serving_artifact(buf_path)

    def fwd(p, x):
        x = data_lib.preprocess_tiles(x, size=tile, dtype=dtype)
        return model.apply(p, x, train=False)

    spec_p = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        params)
    spec_x = jax.ShapeDtypeStruct((batch_size, tile, tile, 3), np.uint8)
    with attn_ops.force_xla_path():
        exp = jexport.export(jax.jit(fwd), platforms=tuple(platforms))(
            spec_p, spec_x)
    module = exp.serialize()

    out_meta = dict(meta or {})
    out_meta.update(
        format="duoformer-stablehlo", format_version=1,
        batch=batch_size, tile=tile, dtype=str(jnp.dtype(dtype)),
        platforms=list(exp.platforms), jax_version=jax.__version__,
        folded=bool(pmeta.get("folded", False)),
        num_classes=(int(getattr(model, "num_classes", 0))
                     or int(getattr(getattr(model, "transformer", model),
                                    "num_classes", 0)) or None),
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(META_NAME, json.dumps(out_meta, indent=1))
        z.writestr(MODULE_NAME, module)
        with open(buf_path, "rb") as f:
            z.writestr(PARAMS_NAME, f.read())
    import os
    os.remove(buf_path)
    return out_meta


class StableHLOPredictor:
    """Serve an export_stablehlo artifact: __call__(uint8 tiles) -> logits.

    The artifact's batch size is static — pad short batches to
    `self.batch` and slice the result (cli predict does this)."""

    def __init__(self, exported, params, meta: dict):
        self.meta = meta
        self.batch = int(meta["batch"])
        self.params = params
        # jit the deserialized call so repeat batches hit the executable
        # cache instead of re-lowering the module
        self._call = jax.jit(exported.call)

    def __call__(self, tiles):
        return self._call(self.params, jnp.asarray(tiles))

    def predict_proba(self, tiles):
        return jax.nn.softmax(self(tiles).astype(jnp.float32), axis=-1)


def load_stablehlo(path: str) -> StableHLOPredictor:
    """-> StableHLOPredictor from export_stablehlo's zip. Needs only jax
    (no model code, no torch): the module is deserialized StableHLO and
    the params are a flat npz."""
    import os
    import tempfile

    from jax import export as jexport

    from ..inference import load_serving_artifact

    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read(META_NAME).decode())
        exported = jexport.deserialize(z.read(MODULE_NAME))
        # load_serving_artifact np.loads its input twice (meta pass +
        # tree pass), so hand it a real file, not a one-shot BytesIO
        fd, tmp = tempfile.mkstemp(suffix=".npz")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(z.read(PARAMS_NAME))
            params, _pmeta = load_serving_artifact(tmp)
        finally:
            os.remove(tmp)
    return StableHLOPredictor(exported, params, meta)
