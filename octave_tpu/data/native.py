"""ctypes bindings for the native C++ image loader (compiled on demand).

The framework's native data-loader core (octave_tpu/data/_native/loader.cpp):
PNG/BMP/PGM decode to grayscale uint8 + threaded batch fill. Built once with
g++ into _native/liboctave_loader.so; falls back gracefully when no compiler
is present (datasets.py then requires pillow/imageio or SyntheticOcta).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "_native")
_SRC = os.path.join(_DIR, "loader.cpp")
_SO = os.path.join(_DIR, "liboctave_loader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    """Compile the loader; returns an error string or None."""
    cmd = [
        "g++", "-O2", "-fPIC", "-shared", "-std=c++17", _SRC,
        "-o", _SO, "-lpng", "-lz", "-pthread",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"g++ unavailable: {e}"
    if proc.returncode != 0:
        return f"native loader build failed:\n{proc.stderr}"
    return None


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_error
    with _lock:
        if _lib is not None:
            return _lib
        if _build_error is not None:
            return None
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            err = _build()
            if err is not None:
                _build_error = err
                return None
        lib = ctypes.CDLL(_SO)
        lib.octave_image_size.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)
        ]
        lib.octave_image_size.restype = ctypes.c_int
        lib.octave_decode_image.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int
        ]
        lib.octave_decode_image.restype = ctypes.c_int
        lib.octave_load_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.octave_load_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def build_error() -> Optional[str]:
    get_lib()
    return _build_error


def image_size(path: str):
    lib = get_lib()
    if lib is None:
        raise RuntimeError(_build_error or "native loader unavailable")
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.octave_image_size(path.encode(), ctypes.byref(w), ctypes.byref(h)) != 0:
        raise IOError(f"cannot decode {path}")
    return h.value, w.value


def decode_image(path: str) -> np.ndarray:
    """Decode one image to (h, w) uint8 grayscale."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError(_build_error or "native loader unavailable")
    h, w = image_size(path)
    out = np.empty((h, w), np.uint8)
    rc = lib.octave_decode_image(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h
    )
    if rc != 0:
        raise IOError(f"decode failed for {path}")
    return out


def load_batch(paths: List[str], size, n_threads: Optional[int] = None) -> np.ndarray:
    """Decode + nearest-resize a batch of files into (n, h, w) uint8 with
    the native thread pool."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError(_build_error or "native loader unavailable")
    h, w = size
    n = len(paths)
    out = np.empty((n, h, w), np.uint8)
    if n_threads is None:
        n_threads = min(8, max(1, os.cpu_count() or 1))
    failures = lib.octave_load_batch(
        "\n".join(paths).encode(), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h, n_threads,
    )
    if failures:
        raise IOError(f"{failures}/{n} images failed to decode")
    return out
