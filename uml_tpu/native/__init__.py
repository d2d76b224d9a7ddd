"""Native (C++) host-pipeline components.

``fast_decode_jpeg(path_or_bytes, target)`` decodes + shorter-side-resizes
+ center-crops a JPEG through libjpeg IDCT scaling (uml_tpu/native/
jpeg_decoder.cpp), 2-4x faster than the PIL path on the same core — the
host decode is the wall for the feature-extraction throughput target.

The shared library is compiled on first use with g++ (no pybind11;
plain C ABI + ctypes) and cached next to this file; environments without a
toolchain or libjpeg transparently fall back to PIL
(uml_tpu.data.transforms.load_uint8).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "jpeg_decoder.cpp")
_LIB = os.path.join(_DIR, "libuml_jpeg.so")

_lib = None
_load_error: str | None = None


def _build() -> None:
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-o", _LIB, _SRC, "-ljpeg"]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _load():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.uml_decode_jpeg_resize_crop.restype = ctypes.c_int
        lib.uml_decode_jpeg_resize_crop.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_void_p,
        ]
        _lib = lib
    except Exception as e:  # toolchain or libjpeg missing
        _load_error = f"{type(e).__name__}: {e}"
    return _lib


def native_available() -> bool:
    return _load() is not None


def fast_decode_jpeg(src, target: int = 224) -> np.ndarray:
    """JPEG path/bytes -> uint8 [target, target, 3] (decode+resize+crop).

    Raises RuntimeError if the native library is unavailable or the file
    isn't a decodable JPEG — callers fall back to the PIL path.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native decoder unavailable ({_load_error})")
    if isinstance(src, (str, os.PathLike)):
        with open(src, "rb") as f:
            data = f.read()
    else:
        data = bytes(src)
    out = np.empty((target, target, 3), dtype=np.uint8)
    rc = lib.uml_decode_jpeg_resize_crop(
        data, len(data), target, out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise RuntimeError(f"jpeg decode failed (rc={rc})")
    return out
