"""ctypes front-end for the native threaded JPEG/PNG batch decoder
(native/image_decode.cpp): whole batches of files decode in parallel on
C++ threads straight into one contiguous [n, size, size, 3] uint8 buffer.
Built on demand with g++ against the system libjpeg/libpng; any failure
(missing toolchain or libs) degrades transparently to the PIL path in
data/folder.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           os.pardir, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libimage_decode.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "image_decode.cpp")

_lib = None
_lib_tried = False


def _load_native():
    """Build (once) and load the C++ decoder; None on any failure."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC_PATH)):
            # temp + atomic rename: concurrent processes must never CDLL a
            # partially written .so (the loser of the race just re-renames
            # an identical file)
            tmp = f"{_LIB_PATH}.{os.getpid()}.tmp"
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", tmp,
                     _SRC_PATH, "-ljpeg", "-lpng", "-lz", "-lpthread"],
                    check=True, capture_output=True)
                os.replace(tmp, _LIB_PATH)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.decode_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        lib.decode_resize_batch.restype = None
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load_native() is not None


def decodable(path: str) -> bool:
    """Formats the native decoder handles (others fall back to PIL)."""
    return path.lower().endswith((".jpg", ".jpeg", ".png"))


def decode_batch(paths: List[str], size: int,
                 num_threads: Optional[int] = None
                 ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Decode + bilinear-resize a batch of JPEG/PNG files on C++ threads.

    Returns (images uint8 [n, size, size, 3], ok int32 [n]) — ok[i]=0 rows
    are zero-filled and should be substituted by the caller — or None when
    the native library is unavailable."""
    lib = _load_native()
    if lib is None:
        return None
    n = len(paths)
    out = np.zeros((n, size, size, 3), np.uint8)
    status = np.zeros((n,), np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    threads = num_threads or min(n, os.cpu_count() or 1)
    lib.decode_resize_batch(arr, n, size, out.ctypes.data,
                            status.ctypes.data, threads)
    return out, status
