"""Native threaded JPEG/PNG batch decoder (native/image_decode.cpp) vs
the PIL reference path."""

import os

import numpy as np
import pytest

from duoformer_tcga_tpu.data import folder as folder_lib
from duoformer_tcga_tpu.data import native_decode as nd

pytestmark = pytest.mark.skipif(not nd.available(),
                                reason="native decoder unavailable")


def _write_images(tmp_path, size=64):
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    arrs = []
    for i, ext in enumerate(["png", "png", "jpg", "jpeg"]):
        arr = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        p = str(tmp_path / f"img{i}.{ext}")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
        arrs.append(arr)
    return paths, arrs


def test_png_native_size_exact(tmp_path):
    paths, arrs = _write_images(tmp_path)
    out, ok = nd.decode_batch(paths[:2], 64)
    assert ok.tolist() == [1, 1]
    np.testing.assert_array_equal(out[0], arrs[0])
    np.testing.assert_array_equal(out[1], arrs[1])


def test_jpeg_matches_pil_decode(tmp_path):
    """Both decode with libjpeg-family codecs; allow small IDCT variance."""
    paths, _ = _write_images(tmp_path)
    out, ok = nd.decode_batch(paths[2:], 64)
    assert ok.tolist() == [1, 1]
    for j, p in enumerate(paths[2:]):
        ref = folder_lib._decode(p, 64)
        diff = np.abs(out[j].astype(int) - ref.astype(int))
        assert diff.mean() < 1.0 and diff.max() <= 16, \
            (diff.mean(), diff.max())


def test_resize_close_to_pil(tmp_path):
    """Bilinear downscale 64 -> 32: same convention as PIL up to rounding
    (PIL's BILINEAR is area-weighted when downscaling, so allow slack)."""
    paths, _ = _write_images(tmp_path)
    out, ok = nd.decode_batch([paths[0]], 32)
    assert ok[0] == 1
    ref = folder_lib._decode(paths[0], 32)
    diff = np.abs(out[0].astype(int) - ref.astype(int))
    assert diff.mean() < 24, diff.mean()


def test_grayscale_and_failure_rows(tmp_path):
    from PIL import Image

    g = np.random.default_rng(1).integers(0, 256, (48, 48), dtype=np.uint8)
    gp = str(tmp_path / "gray.png")
    Image.fromarray(g, mode="L").save(gp)
    bad = str(tmp_path / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"\xff\xd8not a real jpeg")
    out, ok = nd.decode_batch([gp, bad], 48)
    assert ok.tolist() == [1, 0]
    np.testing.assert_array_equal(out[0], np.stack([g] * 3, axis=-1))
    assert (out[1] == 0).all()


def test_folder_dataset_uses_native_and_matches_pil(tmp_path):
    """End-to-end ImageFolderDataset parity: batches via the native
    decoder equal the pure-PIL path for PNG inputs at native size."""
    from PIL import Image

    rng = np.random.default_rng(2)
    for cls in ("a", "b"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(3):
            arr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(str(d / f"{i}.png"))
    ds = folder_lib.ImageFolderDataset(str(tmp_path), size=32)
    batch = next(ds.batches(4, seed=0, shuffle=False))
    assert batch["image"].shape == (4, 32, 32, 3)

    paths = [s[0] for s in ds.samples[:4]]
    ref = np.stack([folder_lib._decode(p, 32) for p in paths])
    np.testing.assert_array_equal(batch["image"], ref)


def test_hostile_png_header_degrades_to_failure(tmp_path):
    """A PNG header claiming absurd dimensions (100000x100000 = 30GB RGB)
    must come back status 0 — not bad_alloc -> std::terminate in a worker
    thread (ADVICE r2). The file is a syntactically valid signature+IHDR
    with correct CRC, then garbage."""
    import struct
    import zlib

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 100000, 100000, 8, 2, 0, 0, 0)
    data = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + b"junk" * 8
    p = str(tmp_path / "huge.png")
    with open(p, "wb") as f:
        f.write(data)
    out, ok = nd.decode_batch([p], 48)
    assert ok.tolist() == [0]
    assert (out[0] == 0).all()
