"""ctypes binding for the native PNG decoder (``native/fastpng.cpp``).

Builds the shared library on first use (g++ + zlib — both baked into the
image), caches it next to the source, and falls back to PIL transparently if
anything is unavailable.  The decode path is the reference's ``pyspng`` role
(``gmpi/datasets.py:109-111``): host-side PNG decode is the data-loader
bottleneck at 1024² training.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "fastpng.cpp")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    lib_path = os.path.join(os.path.dirname(src), "libfastpng.so")
    try:
        if not os.path.exists(lib_path) or os.path.getmtime(lib_path) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", src, "-lz", "-o", lib_path],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(lib_path)
        lib.fastpng_info.restype = ctypes.c_int
        lib.fastpng_decode.restype = ctypes.c_int
        lib.fastpng_box_downscale.restype = ctypes.c_int
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _build_and_load() is not None


def decode(png_bytes: bytes) -> Optional[np.ndarray]:
    """PNG bytes -> HWC uint8 array, or None if unsupported (caller falls
    back to PIL)."""
    lib = _build_and_load()
    if lib is None:
        return None
    buf = np.frombuffer(png_bytes, np.uint8)
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    c = ctypes.c_int32()
    rc = lib.fastpng_info(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), ctypes.c_int64(buf.size),
        ctypes.byref(w), ctypes.byref(h), ctypes.byref(c),
    )
    if rc != 0:
        return None
    out = np.empty((h.value, w.value, c.value), np.uint8)
    rc = lib.fastpng_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), ctypes.c_int64(buf.size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), ctypes.c_int32(out.size),
    )
    if rc != 0:
        return None
    return out


def box_downscale(img: np.ndarray, factor: int) -> Optional[np.ndarray]:
    """Integer box-filter downscale (native); None on unsupported shape."""
    lib = _build_and_load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img)
    h, w, c = img.shape
    if h % factor or w % factor:
        return None
    out = np.empty((h // factor, w // factor, c), np.uint8)
    rc = lib.fastpng_box_downscale(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int32(h), ctypes.c_int32(w), ctypes.c_int32(c),
        ctypes.c_int32(factor),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out if rc == 0 else None
