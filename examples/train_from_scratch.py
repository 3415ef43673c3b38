"""Train DuoFormer from scratch, end to end, on a learnable synthetic task.

The round-4 convergence recipe as a runnable example (the workflow a
user without the released checkpoints follows):

  1. pretrain the ResNet-50 trunk on the task (unfrozen, torch-style
     batch-stat BN with running-stat threading);
  2. export it as a torchvision state_dict
     (`torch_convert.resnet_to_torch_state_dict` — the same file
     `cli export --torch-backbone=` writes after a `cli train` run);
  3. build tint HDF5 datasets and fine-tune the full DuoFormer through
     `cli train` with `--train.init_backbone=` to the reference's own
     >=0.75 eval-accuracy gate (main_toy.py:138).

Notes from the measured study (docs/performance.md, round 4):
  * DuoFormerLegacy (`--preset=legacy-channel`) trains as-is at full
    size (768/12/12): eval 1.0 by step 25 on a v5e chip.
  * The release family at full size needs `--model.apply_fc_norm=true`
    (the opt-in Q7 fix) to train on a sane budget — the bit-faithful
    config attenuates the CLS by ~0.31^depth (quirk Q7 discards the
    fc_norm that would rescale it) and only escapes via a loss-explosion
    knife-edge at f32/constant-lr/1500 steps.
  * BN calibration alone is NOT enough for the trunk — it must be
    task-pretrained (measured negative in tests/test_convergence.py).

    python examples/train_from_scratch.py [--size 96 --depth 2]
    python examples/train_from_scratch.py --size 768 --depth 12 \
        --fc-norm --batch 256        # full flagship (TPU)
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=96,
                    help="embed/proj dim (768 = full flagship)")
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=125)
    ap.add_argument("--pretrain-steps", type=int, default=40)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--fc-norm", action="store_true",
                    help="apply the Q7 fix (required for the release "
                         "family at full size)")
    ap.add_argument("--legacy", action="store_true",
                    help="train DuoFormerLegacy instead of the release "
                         "family")
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    from duoformer_tcga_tpu import cli
    from duoformer_tcga_tpu import train as train_lib
    from duoformer_tcga_tpu.data import pipeline as dl
    from duoformer_tcga_tpu.models.resnet import ResNet50withFC
    from duoformer_tcga_tpu.utils import torch_convert as tc

    d = args.workdir or tempfile.mkdtemp(prefix="duoformer_scratch_")
    os.makedirs(d, exist_ok=True)

    # -- 1. trunk pretraining on the tint task ---------------------------
    probe = ResNet50withFC(num_classes=2, dtype=jnp.float32)

    class M:
        @staticmethod
        def apply(params, x, rng=None, train=False, bn_stats=None):
            return probe.apply(params, x, rng=rng, train=train,
                               freeze=False, bn_stats=bn_stats)

    opt = train_lib.make_optimizer(
        train_lib.onecycle_schedule(1e-3, args.pretrain_steps))
    state = train_lib.init_train_state(probe, jax.random.PRNGKey(0), opt)
    step = train_lib.make_train_step(M, opt, donate=False, bn_stats=True)
    rng = jax.random.PRNGKey(1)
    m = None
    for i, raw in zip(range(args.pretrain_steps),
                      dl.synthetic_tiles(args.batch, 2, seed=0,
                                         learnable=True)):
        b = {"image": dl.preprocess_tiles(jnp.asarray(raw["image"]),
                                          dtype=jnp.float32),
             "label": jnp.asarray(raw["label"])}
        state, m = step(state, b, rng)
    if m is not None:
        print(f"[pretrain] {args.pretrain_steps} steps, final train acc "
              f"{float(m['accuracy']):.2f}")

    # -- 2. export the trunk as a torchvision state_dict -----------------
    trunk = jax.tree.map(lambda a: np.asarray(a, np.float32),
                         jax.device_get(state["params"]["trunk"]))
    trunk_path = os.path.join(d, "trunk_tint.torch")
    torch.save(tc.resnet_to_torch_state_dict(trunk, 50), trunk_path)
    print(f"[export] trunk -> {trunk_path}")

    # -- 3. datasets + full cli train ------------------------------------
    train_h5 = dl.write_synthetic_hdf5(os.path.join(d, "tint_train.h5"),
                                       16 * args.batch, num_classes=2,
                                       seed=3)
    eval_h5 = dl.write_synthetic_hdf5(os.path.join(d, "tint_eval.h5"),
                                      8 * args.batch, num_classes=2,
                                      seed=99)
    argv = [
        "train",
        f"--preset={'legacy-channel' if args.legacy else 'release-2scale'}",
        f"--model.depth={args.depth}",
        f"--model.embed_dim={args.size}", f"--model.proj_dim={args.size}",
        f"--train.batch_size={args.batch}",
        f"--train.dataset={train_h5}", f"--train.eval_dataset={eval_h5}",
        f"--train.init_backbone={trunk_path}",
        "--train.steps_per_epoch=25", "--train.epochs=20",
        f"--steps={args.steps}", f"--train.lr={args.lr}",
        f"--train.checkpoint_dir={os.path.join(d, 'ck')}",
    ]
    if args.fc_norm:
        argv.append("--model.apply_fc_norm=true")
    print("[cli]", " ".join(argv))
    cli.main(argv)


if __name__ == "__main__":
    main()
