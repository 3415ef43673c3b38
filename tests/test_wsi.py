"""WSI streaming path: native C++ extractor vs numpy, end-to-end stream."""

import numpy as np

import jax

from duoformer_tcga_tpu.data import wsi


def _plane(h=512, w=768, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8)


class TestNativeExtractor:
    def test_native_lib_builds(self):
        assert wsi._load_native() is not None, \
            "C++ tile extractor failed to build (g++ expected in image)"

    def test_matches_numpy(self):
        plane = _plane()
        coords = wsi.grid_coords(*plane.shape[:2], tile=128)
        native = wsi.extract_tiles(plane, coords, tile=128)
        ref = np.stack([plane[y:y + 128, x:x + 128] for y, x in coords])
        np.testing.assert_array_equal(native, ref)

    def test_overlapping_stride(self):
        plane = _plane(300, 300)
        coords = wsi.grid_coords(300, 300, tile=128, stride=64)
        tiles = wsi.extract_tiles(plane, coords, tile=128)
        assert tiles.shape[0] == len(coords) == 9
        np.testing.assert_array_equal(tiles[1], plane[0:128, 64:192])

    def test_downsample2x(self):
        plane = _plane(64, 64)
        out = wsi.downsample2x(plane)
        assert out.shape == (32, 32, 3)
        # spot-check one 2x2 box average (round-half-up matches +2//4)
        expect = (plane[0:2, 0:2].astype(int).sum(axis=(0, 1)) + 2) // 4
        np.testing.assert_array_equal(out[0, 0], expect)


class TestStreaming:
    def test_stream_classify_tiny(self):
        import duoformer_tcga_tpu as dft
        import jax.numpy as jnp

        model = dft.build_model_no_extra_params(
            num_classes=2, num_layers=2, embed_dim=96, proj_dim=96,
            num_heads=12, depth=1, dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0))
        reader = wsi.WSIReader(plane=_plane(448, 672))   # 2x3 grid of 224s
        outs = [np.asarray(o) for o in wsi.stream_classify(
            model, params, reader, batch_size=3, tile=224,
            dtype=jnp.float32)]
        assert len(outs) == 2          # 6 tiles / batch 3
        assert outs[0].shape == (3, 2)

    def test_pad_final_batch(self):
        reader = wsi.WSIReader(plane=_plane(448, 672))   # 6 tiles of 224
        batches = list(reader.iter_tile_batches(4, tile=224, pad_final=True))
        assert len(batches) == 2 and batches[1].shape[0] == 4
        assert reader.n_tiles() == 6
        # padded rows repeat the last real tile
        np.testing.assert_array_equal(batches[1][2], batches[1][3])

    def test_memmap_reader(self, tmp_path):
        plane = _plane(256, 256)
        path = str(tmp_path / "plane.raw")
        plane.tofile(path)
        reader = wsi.WSIReader(path=path, shape=(256, 256, 3))
        batches = list(reader.iter_tile_batches(1, tile=224))
        assert len(batches) == 1
        np.testing.assert_array_equal(batches[0][0], plane[:224, :224])


def test_extract_tiles_rejects_out_of_bounds():
    """The Python wrapper is the bounds-check layer for the native
    extractor (the C++ reads raw pointers)."""
    import numpy as np
    import pytest

    from duoformer_tcga_tpu.data import wsi as wsi_lib

    plane = np.zeros((64, 64, 3), np.uint8)
    with pytest.raises(ValueError, match="out of bounds"):
        wsi_lib.extract_tiles(plane, np.array([[48, 0]]), tile=32)
    with pytest.raises(ValueError, match="out of bounds"):
        wsi_lib.extract_tiles(plane, np.array([[0, -1]]), tile=32)
    # boundary-exact is fine
    out = wsi_lib.extract_tiles(plane, np.array([[32, 32]]), tile=32)
    assert out.shape == (1, 32, 32, 3)
