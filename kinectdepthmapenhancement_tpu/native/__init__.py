"""ctypes binding for the native C++ frame source (framesource.cpp).

Builds lazily with g++ on first use (no pybind11; plain C ABI).  Falls back
gracefully: `available()` is False if no compiler is present, and callers can
use the pure-Python loaders in core/io.py instead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "framesource.cpp")
_LIB = os.path.join(_HERE, "libframesource.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build() -> Optional[ctypes.CDLL]:
    global _build_error
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        cmd = [
            "g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
            _SRC, "-o", _LIB,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            _build_error = getattr(e, "stderr", str(e)) or str(e)
            return None
    lib = ctypes.CDLL(_LIB)
    lib.fs_open.restype = ctypes.c_longlong
    lib.fs_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.fs_next.restype = ctypes.c_int
    lib.fs_next.argtypes = [ctypes.c_longlong, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.fs_close.restype = ctypes.c_int
    lib.fs_close.argtypes = [ctypes.c_longlong]
    lib.fs_io_errors.restype = ctypes.c_int
    lib.fs_io_errors.argtypes = [ctypes.c_longlong]
    lib.fs_depth_xml_read.restype = ctypes.c_int
    lib.fs_depth_xml_read.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int,
    ]
    return lib


def _get() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is None and _build_error is None:
            _lib = _build()
        return _lib


def available() -> bool:
    return _get() is not None


def build_error() -> Optional[str]:
    _get()
    return _build_error


def read_depth_xml(path: str, name: str, width: int, height: int) -> np.ndarray:
    """One-shot native FileStorage XML matrix read -> f32 [H, W]."""
    lib = _get()
    if lib is None:
        raise RuntimeError(f"native lib unavailable: {_build_error}")
    out = np.empty((height, width), np.float32)
    rc = lib.fs_depth_xml_read(
        path.encode(), name.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), width, height,
    )
    if rc != 0:
        raise IOError(f"fs_depth_xml_read({path!r}, {name!r}) failed: {rc}")
    return out


class FrameSource:
    """Background-threaded round-robin depth frame streamer."""

    def __init__(self, paths: List[str], width: int, height: int, capacity: int = 4):
        lib = _get()
        if lib is None:
            raise RuntimeError(f"native lib unavailable: {_build_error}")
        self._lib = lib
        self.width, self.height = width, height
        self._handle = lib.fs_open("\n".join(paths).encode(), width, height, capacity)
        if self._handle < 0:
            raise IOError("fs_open failed (empty path list?)")

    def next(self, timeout_ms: int = 10000) -> np.ndarray:
        out = np.empty((self.height, self.width), np.float32)
        rc = self._lib.fs_next(
            self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), timeout_ms
        )
        if rc != 0:
            raise TimeoutError(f"fs_next failed: {rc}")
        return out

    def io_errors(self) -> int:
        return int(self._lib.fs_io_errors(self._handle))

    def close(self) -> None:
        if self._handle:
            self._lib.fs_close(self._handle)
            self._handle = 0

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
