"""ctypes bindings for the native Matrix Market parser (native/mmio.cpp).

The reference's loader is single-threaded C++ iostream extraction
(``Source Code/utils.cpp:70-185``); this framework's native loader is a
multithreaded hand-rolled parser behind a C ABI, bound with ctypes (no
pybind11 in this environment). The shared library is built on first use
with ``make`` (or ``g++`` directly) and cached next to the source; when no
compiler is available the pure-numpy loader (``io/mtx.py``) serves
transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from ..formats.matrix import CSR
from .mtx import expand_and_build_csr

__all__ = ["available", "read_matrix_market_native", "native_dir"]

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def native_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native"
    )


class _MMResult(ctypes.Structure):
    _fields_ = [
        ("rows", ctypes.c_int64),
        ("cols", ctypes.c_int64),
        ("nnz", ctypes.c_int64),
        ("declared_nnz", ctypes.c_int64),
        ("symmetric", ctypes.c_int32),
        ("pattern", ctypes.c_int32),
        ("ok", ctypes.c_int32),
        ("row_idx", ctypes.POINTER(ctypes.c_int32)),
        ("col_idx", ctypes.POINTER(ctypes.c_int32)),
        ("values", ctypes.POINTER(ctypes.c_double)),
        ("error", ctypes.c_char * 256),
    ]


def _build() -> Optional[str]:
    d = native_dir()
    src = os.path.join(d, "mmio.cpp")
    lib = os.path.join(d, "libmmio.so")
    if os.path.exists(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
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
        lib.mm_read.restype = ctypes.POINTER(_MMResult)
        lib.mm_read.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.mm_free.restype = None
        lib.mm_free.argtypes = [ctypes.POINTER(_MMResult)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def read_matrix_market_native(path: str, dtype=None,
                              n_threads: int = 0) -> CSR:
    """Parse ``.mtx`` with the native library; CSR build stays in numpy.

    Raises the same exception types as the numpy loader
    (``FileNotFoundError`` / ``ValueError``).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native parser not available")
    if not os.path.exists(path):
        raise FileNotFoundError(f"Unable to open file: {path}")

    # Header semantics (complex rejection, skew-symmetric sign) are owned
    # by the Python header scanner so both parsers behave identically.
    from .mtx import _parse_header

    _, _, skew, _, _, _, _ = _parse_header(path)

    res = lib.mm_read(path.encode(), n_threads)
    try:
        r = res.contents
        if not r.ok:
            msg = r.error.decode(errors="replace")
            if "Unable to open" in msg:
                raise FileNotFoundError(msg)
            raise ValueError(msg)
        nnz = int(r.nnz)
        rows = np.ctypeslib.as_array(r.row_idx, shape=(nnz,)).astype(
            np.int64, copy=True
        )
        cols = np.ctypeslib.as_array(r.col_idx, shape=(nnz,)).astype(
            np.int64, copy=True
        )
        values = np.ctypeslib.as_array(r.values, shape=(nnz,)).copy()
        m, n = int(r.rows), int(r.cols)
        symmetric = bool(r.symmetric)
        pattern = bool(r.pattern)
    finally:
        lib.mm_free(res)

    if pattern:
        values = np.ones(nnz, dtype=np.float64)
    return expand_and_build_csr(
        rows, cols, values, m, n, symmetric, dtype,
        mirror_sign=-1.0 if skew else 1.0,
    )
