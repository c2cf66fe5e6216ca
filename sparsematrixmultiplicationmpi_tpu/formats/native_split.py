"""ctypes binding for the native f32 -> bf16 hi|lo splitter
(``native/tilesplit.cpp``).

The lane-packed split planes are built once per format
(``formats/windowed.py::_split_planes``) but over tile arrays that reach
hundreds of MB on the cop20k class; ml_dtypes' single-threaded astype
took ~9 s of the 24 s format build. The native routine is the same
round-to-nearest-even conversion, multithreaded to memory bandwidth.
Falls back transparently (returns None) when no compiler is available —
callers keep the numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = ["split_bf16_hilo_native", "available"]

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _native_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        "native")


def _build() -> Optional[str]:
    d = _native_dir()
    src = os.path.join(d, "tilesplit.cpp")
    lib = os.path.join(d, "libtilesplit.so")
    if os.path.exists(lib) and \
            os.path.getmtime(lib) >= os.path.getmtime(src):
        return lib
    if not os.path.exists(src):
        return None
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-pthread",
             "-o", lib, src],
            check=True, capture_output=True, timeout=120,
        )
        return lib
    except (OSError, subprocess.SubprocessError):
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.split_bf16_hilo.restype = None
        lib.split_bf16_hilo.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def split_bf16_hilo_native(tiles: np.ndarray,
                           n_threads: int = 0) -> Optional[np.ndarray]:
    """``(..., C) f32 -> (..., 2C) bf16`` lane-packed hi|lo split, or
    None when the native library is unavailable. Bit-identical to the
    ml_dtypes round-trip (round-to-nearest-even both passes)."""
    lib = _load()
    if lib is None:
        return None
    import ml_dtypes

    src = np.ascontiguousarray(tiles, dtype=np.float32)
    cols = src.shape[-1]
    rows = src.size // max(cols, 1)
    out = np.empty(src.shape[:-1] + (2 * cols,), dtype=np.uint16)
    if src.size:
        lib.split_bf16_hilo(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            rows, cols, n_threads)
    return out.view(ml_dtypes.bfloat16)
