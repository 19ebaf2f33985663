"""ctypes loader for the native C++ runtime library.

Builds ``librsvd_native.so`` on first use (cached thereafter) and exposes a
thin NumPy-typed wrapper.  Every entry point has a pure-Python fallback in
the calling module, so the framework works even without a C++ toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "librsvd_native.so")
_lock = threading.Lock()
_lib_wrapper = None
_load_attempted = False


class NativeLib:
    def __init__(self, cdll: ctypes.CDLL):
        self._lib = cdll
        lib = self._lib
        lib.mmio_read.restype = ctypes.c_int
        lib.mmio_read.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.mmio_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
        lib.mmio_write.restype = ctypes.c_int
        lib.mmio_write.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.codec_quantize_affine.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.codec_dequantize_affine.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.codec_quantize_truncate.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.codec_dequantize_truncate.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
        ]

    def read_mtx(self, path: str) -> np.ndarray:
        data = ctypes.POINTER(ctypes.c_double)()
        rows = ctypes.c_int64()
        cols = ctypes.c_int64()
        rc = self._lib.mmio_read(
            path.encode(), ctypes.byref(data), ctypes.byref(rows), ctypes.byref(cols)
        )
        if rc != 0:
            raise IOError(f"mmio_read({path}) failed with code {rc}")
        try:
            n = rows.value * cols.value
            arr = np.ctypeslib.as_array(data, shape=(n,)).copy()
            return arr.reshape(rows.value, cols.value)
        finally:
            self._lib.mmio_free(data)

    def write_mtx(self, path: str, a: np.ndarray) -> None:
        a = np.ascontiguousarray(a, dtype=np.float64)
        rc = self._lib.mmio_write(
            path.encode(),
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            a.shape[0],
            a.shape[1],
        )
        if rc != 0:
            raise IOError(f"mmio_write({path}) failed with code {rc}")

    def quantize_affine(self, x: np.ndarray):
        x = np.ascontiguousarray(x, dtype=np.float64)
        out = np.empty(x.size, dtype=np.uint8)
        scale = ctypes.c_double()
        offset = ctypes.c_double()
        self._lib.codec_quantize_affine(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            x.size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(scale),
            ctypes.byref(offset),
        )
        return out.reshape(x.shape), scale.value, offset.value

    def dequantize_affine(self, q: np.ndarray, scale: float, offset: float):
        q = np.ascontiguousarray(q, dtype=np.uint8)
        out = np.empty(q.size, dtype=np.float64)
        self._lib.codec_dequantize_affine(
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            q.size,
            scale,
            offset,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return out.reshape(q.shape)

    def quantize_truncate(self, x: np.ndarray):
        x = np.ascontiguousarray(x, dtype=np.float64)
        out = np.empty(x.size, dtype=np.uint8)
        self._lib.codec_quantize_truncate(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            x.size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out.reshape(x.shape)

    def dequantize_truncate(self, q: np.ndarray):
        q = np.ascontiguousarray(q, dtype=np.uint8)
        out = np.empty(q.size, dtype=np.float64)
        self._lib.codec_dequantize_truncate(
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            q.size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return out.reshape(q.shape)


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _HERE, "-s"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_native_lib() -> Optional[NativeLib]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib_wrapper, _load_attempted
    if _lib_wrapper is not None or _load_attempted:
        return _lib_wrapper
    with _lock:
        if _lib_wrapper is not None or _load_attempted:
            return _lib_wrapper
        _load_attempted = True
        if not os.path.exists(_LIB_PATH):
            srcs = [os.path.join(_HERE, s) for s in ("mmio.cpp", "codec.cpp")]
            if not all(os.path.exists(s) for s in srcs) or not _build():
                return None
        try:
            _lib_wrapper = NativeLib(ctypes.CDLL(_LIB_PATH))
        except OSError:
            _lib_wrapper = None
    return _lib_wrapper
