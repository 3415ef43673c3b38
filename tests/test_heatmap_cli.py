"""CLI surface for interpretability: `cli heatmap` (slide-level
probability/attention heatmaps) and `predict --attn-maps` (per-tile
rollout export), plus the dependency-free colormap renderer."""

import numpy as np

import pytest

from duoformer_tcga_tpu import cli


def _common(tmp_path):
    return ["--preset=release-2scale", "--model.depth=1",
            "--model.embed_dim=96", "--model.proj_dim=96",
            "--model.dtype=float32", "--train.platform=cpu",
            "--train.batch_size=8",
            f"--train.checkpoint_dir={tmp_path}/ck"]


@pytest.fixture
def plane_npy(tmp_path):
    """448x672 synthetic slide plane -> a 2x3 grid of 224^2 tiles."""
    rng = np.random.default_rng(0)
    plane = rng.integers(0, 256, (448, 672, 3), np.uint8)
    path = tmp_path / "slide.npy"
    np.save(path, plane)
    return str(path)


def test_cli_heatmap_fine(tmp_path, plane_npy):
    out = str(tmp_path / "hm.png")
    assert cli.main(["heatmap", *_common(tmp_path),
                     f"--slide={plane_npy}", f"--output={out}"]) == 0
    import os
    assert os.path.exists(out)
    z = np.load(out + ".npz")
    assert z["prob_grid"].shape == (2, 3, 2)
    np.testing.assert_allclose(z["prob_grid"].sum(-1), np.ones((2, 3)),
                               atol=1e-5)
    assert z["heatmap"].shape == (14, 21)          # 7x7 regions per tile
    assert z["region_rollout"].shape == (6, 49)
    np.testing.assert_allclose(z["region_rollout"].sum(-1), np.ones(6),
                               atol=1e-5)
    # fine map integrates back to the tile probability (rollout sums to 1)
    fine = z["heatmap"].reshape(2, 7, 3, 7).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(fine.mean((-1, -2)),
                               z["prob_grid"][..., 1], atol=1e-5)


def test_cli_heatmap_no_attn(tmp_path, plane_npy):
    out = str(tmp_path / "hm0.png")
    assert cli.main(["heatmap", *_common(tmp_path), f"--slide={plane_npy}",
                     f"--output={out}", "--no-attn", "--class=0"]) == 0
    z = np.load(out + ".npz")
    assert z["heatmap"].shape == (2, 3)
    np.testing.assert_allclose(z["heatmap"], z["prob_grid"][..., 0])
    assert "region_rollout" not in z


def test_cli_heatmap_class_out_of_range(tmp_path, plane_npy):
    with pytest.raises(ValueError, match="--class"):
        cli.main(["heatmap", *_common(tmp_path), f"--slide={plane_npy}",
                  "--class=7"])


def test_cli_predict_attn_maps(tmp_path):
    from PIL import Image

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    rng = np.random.default_rng(1)
    for i in range(3):
        Image.fromarray(rng.integers(0, 256, (224, 224, 3),
                                     np.uint8)).save(str(imgs / f"t{i}.png"))
    attn = str(tmp_path / "attn.npz")
    assert cli.main(["predict", *_common(tmp_path), f"--input={imgs}",
                     f"--output={tmp_path}/p.csv",
                     f"--attn-maps={attn}"]) == 0
    z = np.load(attn)
    assert len(z["paths"]) == 3
    assert z["region_rollout"].shape == (3, 49)
    np.testing.assert_allclose(z["region_rollout"].sum(-1), np.ones(3),
                               atol=1e-5)
    assert z["scale_attn"].shape == (3, 6)         # [scale tok, S=5 tokens]
    np.testing.assert_allclose(z["scale_attn"].sum(-1), np.ones(3),
                               atol=1e-5)


def test_colormap_and_png(tmp_path):
    from PIL import Image

    from duoformer_tcga_tpu.utils.plotting import colormap, save_heatmap_png

    c = colormap(np.linspace(0, 1, 5))
    assert c.shape == (5, 3) and c.dtype == np.uint8
    assert not np.array_equal(c[0], c[-1])         # spans the palette
    path = str(tmp_path / "m.png")
    save_heatmap_png(np.random.default_rng(0).random((7, 9)), path,
                     min_side=100)
    with Image.open(path) as im:
        w, h = im.size
    assert min(w, h) >= 100 and w % 9 == 0 and h % 7 == 0


def test_cli_heatmap_stride_overlap(tmp_path, plane_npy):
    """--stride < tile: overlapping tiles' 7x7 evidence averages into a
    shared region-cell canvas (cells uncovered by any tile stay 0)."""
    out = str(tmp_path / "hm_s.png")
    assert cli.main(["heatmap", *_common(tmp_path), f"--slide={plane_npy}",
                     f"--output={out}", "--stride=96"]) == 0
    z = np.load(out + ".npz")
    assert z["prob_grid"].shape == (3, 5, 2)        # (448-224)/96+1 x ...
    assert z["heatmap"].shape == (14, 21)           # 448/32 x 672/32 cells
    assert np.isfinite(z["heatmap"]).all()
    assert z["region_rollout"].shape == (15, 49)
    # overlapped interior cells hold averages bounded by the max evidence
    fine_max = (z["region_rollout"] * 49.0).max()
    assert z["heatmap"].max() <= fine_max + 1e-6
