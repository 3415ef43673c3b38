"""WSI (whole-slide image) tile streaming — the north-star workload
("streamed WSI tile workload: on-device decode/normalize/patchify ->
batched DuoFormer", BASELINE.json config #5).

Host side: a memory-mapped decoded WSI plane (uint8 [H, W, 3]) + a native
C++ tile extractor (native/tile_extract.cpp, built on demand via g++ and
loaded with ctypes; transparent numpy fallback). Device side: the fused
normalize pipeline (data/pipeline.py) and the model forward, batched and
sharded over the mesh.

The reference has no data path at all (its `dataset` module is missing —
quirk Q1); this subsystem is new capability.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           os.pardir, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtile_extract.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "tile_extract.cpp")

_lib = None
_lib_tried = False


def _load_native():
    """Build (once) and load the C++ extractor; None on any failure."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC_PATH)):
            # temp + atomic rename (see data/native_decode.py): concurrent
            # processes must never CDLL a partially written .so
            tmp = f"{_LIB_PATH}.{os.getpid()}.tmp"
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", tmp,
                     _SRC_PATH, "-lpthread"],
                    check=True, capture_output=True)
                os.replace(tmp, _LIB_PATH)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.extract_tiles.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64]
        lib.downsample2x.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def extract_tiles(plane: np.ndarray, coords: np.ndarray,
                  tile: int = 224, num_threads: Optional[int] = None
                  ) -> np.ndarray:
    """Gather [n, tile, tile, 3] uint8 tiles at (y, x) origins from a
    [H, W, 3] uint8 plane. Native C++ path when available."""
    assert plane.dtype == np.uint8 and plane.ndim == 3
    coords = np.ascontiguousarray(coords, dtype=np.int64).reshape(-1, 2)
    n = len(coords)
    H, W, C = plane.shape
    if n and (coords.min() < 0 or (coords[:, 0] + tile > H).any()
              or (coords[:, 1] + tile > W).any()):
        # the native path would read out of bounds (no checks in C++ by
        # design — this wrapper is the validation layer)
        raise ValueError(
            f"tile origins out of bounds for plane {H}x{W} with "
            f"tile={tile}")
    lib = _load_native()
    if lib is not None and plane.flags["C_CONTIGUOUS"]:
        out = np.empty((n, tile, tile, C), np.uint8)
        nt = num_threads or min(8, os.cpu_count() or 1)
        lib.extract_tiles(
            plane.ctypes.data, H, W, C, coords.ctypes.data, n, tile,
            out.ctypes.data, nt)
        return out
    return np.stack([plane[y:y + tile, x:x + tile] for y, x in coords])


def downsample2x(plane: np.ndarray) -> np.ndarray:
    """2x2 box-filter downsample (host-side pyramid level synthesis)."""
    H, W, C = plane.shape
    lib = _load_native()
    if lib is not None and plane.flags["C_CONTIGUOUS"]:
        out = np.empty((H // 2, W // 2, C), np.uint8)
        lib.downsample2x(plane.ctypes.data, H, W, C, out.ctypes.data)
        return out
    p = plane[:H // 2 * 2, :W // 2 * 2].astype(np.uint16)
    s = (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2] + 2) // 4
    return s.astype(np.uint8)


def grid_coords(H: int, W: int, tile: int = 224,
                stride: Optional[int] = None) -> np.ndarray:
    """Row-major (y, x) origins of all full tiles in an H x W plane."""
    stride = stride or tile
    ys = np.arange(0, H - tile + 1, stride)
    xs = np.arange(0, W - tile + 1, stride)
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    return np.stack([yy.ravel(), xx.ravel()], axis=1).astype(np.int64)


class WSIReader:
    """A decoded WSI plane, optionally memory-mapped from a raw uint8 file.

    File format (for mmap mode): raw C-order uint8 [H, W, 3]; dims passed
    by the caller. Real slide decoders (openslide et al.) can plug in by
    producing planes — decode stays host-side; everything numeric after
    extraction runs on device.
    """

    def __init__(self, plane: Optional[np.ndarray] = None,
                 path: Optional[str] = None,
                 shape: Optional[Tuple[int, int, int]] = None):
        if plane is not None:
            self.plane = plane
        else:
            assert path and shape
            self.plane = np.memmap(path, dtype=np.uint8, mode="r",
                                   shape=shape)
        self.shape = self.plane.shape

    def iter_tile_batches(self, batch_size: int, tile: int = 224,
                          stride: Optional[int] = None,
                          pad_final: bool = False) -> Iterator[np.ndarray]:
        """Stream uint8 tile batches covering the plane (row-major).

        Shapes stay static for jit: with pad_final=False (default) the
        final ragged batch is dropped; with pad_final=True it is padded by
        repeating the last tile — callers use `n_tiles()` to know how many
        of the final batch's rows are real."""
        plane = np.ascontiguousarray(self.plane) if isinstance(
            self.plane, np.memmap) else self.plane
        coords = grid_coords(self.shape[0], self.shape[1], tile, stride)
        n_full = (len(coords) // batch_size) * batch_size
        for i in range(0, n_full, batch_size):
            yield extract_tiles(plane, coords[i:i + batch_size], tile)
        rem = len(coords) - n_full
        if pad_final and rem:
            tail = extract_tiles(plane, coords[n_full:], tile)
            pad = np.repeat(tail[-1:], batch_size - rem, axis=0)
            yield np.concatenate([tail, pad], axis=0)

    def n_tiles(self, tile: int = 224, stride: Optional[int] = None) -> int:
        return len(grid_coords(self.shape[0], self.shape[1], tile, stride))


# -- decode plug-ins ---------------------------------------------------------

_WSI_DECODERS = []


def register_wsi_decoder(fn):
    """Register `fn(path) -> uint8 [H, W, 3] plane or None` as a slide
    decoder (openslide-style hook). Decoders are tried in registration
    order before the built-ins."""
    _WSI_DECODERS.append(fn)
    return fn


def open_slide(path: str, shape: Optional[Tuple[int, int, int]] = None,
               level: int = 0) -> "WSIReader":
    """Open a slide file as a WSIReader through the decoder chain:
    registered hooks -> openslide (if importable) -> .npy (memory-mapped)
    -> PIL images -> raw uint8 memmap (requires `shape`). `level` selects
    the pyramid level for openslide; built-ins synthesize levels with
    downsample2x."""
    for dec in _WSI_DECODERS:
        plane = dec(path)
        if plane is not None:
            return WSIReader(plane=np.asarray(plane, np.uint8))
    try:
        import openslide  # real WSI formats (svs/ndpi/...), when installed

        slide = openslide.OpenSlide(path)
        w, h = slide.level_dimensions[level]
        region = slide.read_region((0, 0), level, (w, h)).convert("RGB")
        return WSIReader(plane=np.asarray(region, np.uint8))
    except ImportError:
        pass
    except Exception:  # noqa: BLE001 — e.g. OpenSlideUnsupportedFormatError
        # openslide is installed but cannot read this file (a .npy plane,
        # plain image, raw memmap ...): fall through to the built-ins
        # below rather than letting its error mask a working decoder
        pass
    if path.endswith(".npy"):
        plane = np.load(path, mmap_mode="r")
        reader = WSIReader(plane=plane)
    elif path.lower().endswith((".png", ".jpg", ".jpeg", ".tif", ".tiff",
                                ".bmp", ".ppm")):
        from PIL import Image

        Image.MAX_IMAGE_PIXELS = None   # WSI planes exceed PIL's default cap
        with Image.open(path) as im:
            reader = WSIReader(plane=np.asarray(im.convert("RGB"), np.uint8))
    else:
        if shape is None:
            raise ValueError(
                f"cannot infer decoder for {path}; pass shape= for raw "
                f"uint8 memmaps or register_wsi_decoder() a custom hook")
        reader = WSIReader(path=path, shape=shape)
    for _ in range(level):
        reader = WSIReader(plane=downsample2x(
            np.ascontiguousarray(reader.plane)))
    return reader


def stream_classify(model, params, reader: WSIReader, batch_size: int = 256,
                    tile: int = 224, mesh=None, dtype=None):
    """End-to-end streamed inference: native tile extraction -> prefetched
    H2D -> fused on-device normalize -> batched forward. Yields per-batch
    logits (device arrays; fetch as needed)."""
    import jax
    import jax.numpy as jnp

    from ..parallel import mesh as mesh_lib
    from . import pipeline as pipe

    dtype = dtype or jnp.bfloat16
    sharding = mesh_lib.batch_sharding(mesh) if mesh is not None else None

    @jax.jit
    def step(p, raw):
        x = pipe.preprocess_tiles(raw, size=tile, dtype=dtype)
        return model.apply(p, x, train=False)

    loader = pipe.PrefetchLoader(
        reader.iter_tile_batches(batch_size, tile), sharding=sharding)
    for raw in loader:
        yield step(params, raw)
