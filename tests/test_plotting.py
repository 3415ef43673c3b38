"""Plotting/metrics utilities."""


from duoformer_tcga_tpu.utils import plotting
from duoformer_tcga_tpu.utils.metrics import MetricLogger


def test_metric_logger_and_plot(tmp_path):
    path = str(tmp_path / "m.jsonl")
    logger = MetricLogger(path, echo=False)
    for i in range(1, 6):
        extra = {"eval_accuracy": 0.5 + i * 0.05} if i % 2 == 0 else {}
        logger.log(i, {"accuracy": 0.4 + i * 0.1, "loss": 1.0 / i}, **extra)
    logger.close()

    recs = plotting.read_metrics(path)
    assert len(recs) == 5 and recs[2]["step"] == 3

    out = plotting.plot_accuracy(path)
    if out.endswith(".png"):
        import os
        assert os.path.getsize(out) > 0
    else:
        assert "train acc" in out


def test_build_hybrid_factory():
    import duoformer_tcga_tpu as dft

    m = dft.build_hybrid(num_classes=3, num_blocks=1, proj_dim=64,
                         num_heads=8)
    assert m.vit.depth == 1
