"""int8-vs-bf16 on the TRAINED full-size release+fc_norm weights at the
logit level (saturation-proof complement to the accuracy/ECE comparison):
max/mean |delta logit|, prob drift, and argmax agreement over 256 held-out
tiles. Uses /tmp/r4_converge/release_fcnorm_params.npz."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np             # noqa: E402
import jax.numpy as jnp        # noqa: E402

import jax                     # noqa: E402

import duoformer_tcga_tpu as dft                          # noqa: E402
from duoformer_tcga_tpu.data import pipeline as dl        # noqa: E402
from duoformer_tcga_tpu.inference import Predictor        # noqa: E402
from duoformer_tcga_tpu.utils.checkpoint import load_params_npz  # noqa: E402


def main():
    model = dft.build_model_no_extra_params(
        num_classes=2, num_layers=2, embed_dim=768, proj_dim=768,
        num_heads=12, depth=12, apply_fc_norm=True, dtype=jnp.bfloat16)
    template = jax.eval_shape(model.init, jax.random.PRNGKey(0))
    params = load_params_npz("/tmp/r4_converge/release_fcnorm_params.npz",
                             template)
    p_bf = Predictor(model, params, dtype=jnp.bfloat16)
    p_i8 = Predictor(model, params, dtype=jnp.bfloat16, quantize=True)
    lb, li, labels = [], [], []
    for i, raw in zip(range(4), dl.synthetic_tiles(64, 2, seed=777,
                                                   learnable=True)):
        lb.append(np.asarray(p_bf(raw["image"]), np.float32))
        li.append(np.asarray(p_i8(raw["image"]), np.float32))
        labels.append(raw["label"])
    lb, li = np.concatenate(lb), np.concatenate(li)
    labels = np.concatenate(labels)
    d = np.abs(lb - li)
    pb = np.exp(lb - lb.max(-1, keepdims=True))
    pb /= pb.sum(-1, keepdims=True)
    pi = np.exp(li - li.max(-1, keepdims=True))
    pi /= pi.sum(-1, keepdims=True)
    agree = float((lb.argmax(-1) == li.argmax(-1)).mean())
    print(f"[int8-logits trained] max|dlogit|={d.max():.4f} "
          f"mean={d.mean():.4f} max|dprob|={np.abs(pb - pi).max():.5f} "
          f"argmax agree={agree:.4f} "
          f"bf16 acc={float((lb.argmax(-1) == labels).mean()):.4f} "
          f"int8 acc={float((li.argmax(-1) == labels).mean()):.4f}",
          flush=True)


if __name__ == "__main__":
    main()
