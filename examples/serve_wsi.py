"""Serve a whole-slide image through DuoFormer, end to end.

Demonstrates the north-star streamed workload: a (synthetic) decoded WSI
plane -> native C++ tile extraction -> prefetched H2D -> fused on-device
normalize -> batched bf16 DuoFormer forward, over every visible chip.

    python examples/serve_wsi.py [--ckpt reference_checkpoint.pt] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", help="reference torch checkpoint to load")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    import duoformer_tcga_tpu as dft
    from duoformer_tcga_tpu.data import wsi
    from duoformer_tcga_tpu.inference import Predictor, from_torch_checkpoint

    model = dft.build_model_no_extra_params(num_classes=2, num_layers=2)
    if args.ckpt:
        pred = from_torch_checkpoint(model, args.ckpt)
    else:
        print("no checkpoint given; using random weights")
        pred = Predictor(model, model.init(jax.random.PRNGKey(0)))

    # synthetic 8x8-tile "slide" plane; swap in a real decoded level
    plane = np.random.default_rng(0).integers(
        0, 256, (8 * 224, 8 * 224, 3), dtype=np.uint8)
    reader = wsi.WSIReader(plane=plane)

    n, positive = 0, 0
    for logits in wsi.stream_classify(pred.model, pred.params, reader,
                                      batch_size=args.batch):
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        cls = np.asarray(jnp.argmax(probs, axis=-1))
        n += len(cls)
        positive += int((cls == 1).sum())
    print(f"classified {n} tiles; class-1 fraction {positive / n:.3f}")


if __name__ == "__main__":
    main()
