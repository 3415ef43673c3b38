"""Early stopping (--train.patience): the epoch loop stops once the
epoch-end eval accuracy has not improved for `patience` consecutive
epochs; the best checkpoint survives in <dir>/best. lr=0 makes the
eval accuracy identical every epoch, so the stop fires
deterministically by the second epoch boundary."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from duoformer_tcga_tpu import cli  # noqa: E402

TINY = [
    "--preset=release-2scale", "--model.depth=1", "--model.embed_dim=96",
    "--model.proj_dim=96", "--model.dtype=float32", "--train.platform=cpu",
    "--train.batch_size=8", "--train.dataset=synthetic",
    "--train.steps_per_epoch=2", "--train.epochs=5", "--train.lr=0.0",
]


def test_early_stop_fires_and_keeps_best(tmp_path, capsys):
    rc = cli.main(["train"] + TINY + ["--train.patience=1",
                                      f"--train.checkpoint_dir={tmp_path}/ck"])
    out = capsys.readouterr().out
    assert rc in (0, None)
    assert "early stop at step" in out
    # stopped at epoch 1 or 2 (2 or 4 steps), far short of the 10 planned
    step = int(out.split("early stop at step ", 1)[1].split(":")[0])
    assert step <= 4
    assert "training done" in out


def test_patience_zero_runs_to_completion(tmp_path, capsys):
    cli.main(["train"] + TINY + [f"--train.checkpoint_dir={tmp_path}/ck"])
    out = capsys.readouterr().out
    assert "early stop" not in out
    assert "[step 10]" in out
