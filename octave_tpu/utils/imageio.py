"""Minimal dependency-free grayscale PNG writer (for prediction outputs).

The image stack in this environment has no pillow/imageio; decode is handled
by the native C++ loader (octave_tpu/data/_native), and this covers the write
side for visualizing predictions.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np


def write_png_gray(path: str, arr: np.ndarray) -> None:
    """Write (h, w) uint8 (or float in [0,1]) as an 8-bit grayscale PNG."""
    if np.issubdtype(arr.dtype, np.floating):
        arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
    assert arr.ndim == 2 and arr.dtype == np.uint8, (arr.shape, arr.dtype)
    h, w = arr.shape
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)
