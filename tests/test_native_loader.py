"""Native C++ image loader: build, decode round-trips (PNG written with a
minimal pure-python encoder, BMP/PGM by hand), batch loading with resize."""
import os
import struct
import zlib

import numpy as np
import pytest

from octave_tpu.data import native


def _write_png_gray(path, arr):
    """Minimal 8-bit grayscale PNG writer (filter 0 rows)."""
    h, w = arr.shape
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # gray, 8-bit
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def _write_bmp_gray8(path, arr):
    """8bpp palettized grayscale BMP (bottom-up)."""
    h, w = arr.shape
    stride = (w + 3) & ~3
    palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    rows = b"".join(
        arr[y].tobytes() + b"\x00" * (stride - w) for y in range(h - 1, -1, -1)
    )
    off = 14 + 40 + len(palette)
    header = (b"BM" + struct.pack("<IHHI", off + len(rows), 0, 0, off)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(rows), 0, 0, 256, 0))
    with open(path, "wb") as f:
        f.write(header + palette + rows)


def _write_pgm(path, arr):
    h, w = arr.shape
    with open(path, "wb") as f:
        f.write(f"P5 {w} {h} 255\n".encode() + arr.tobytes())


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip(f"native loader unavailable: {native.build_error()}")
    return native.get_lib()


@pytest.fixture()
def gray(rng):
    return rng.integers(0, 256, (37, 53), dtype=np.uint8)


class TestDecode:
    def test_png_roundtrip(self, lib, tmp_path, gray):
        p = str(tmp_path / "x.png")
        _write_png_gray(p, gray)
        out = native.decode_image(p)
        np.testing.assert_array_equal(out, gray)

    def test_bmp_roundtrip(self, lib, tmp_path, gray):
        p = str(tmp_path / "x.bmp")
        _write_bmp_gray8(p, gray)
        np.testing.assert_array_equal(native.decode_image(p), gray)

    def test_pgm_roundtrip(self, lib, tmp_path, gray):
        p = str(tmp_path / "x.pgm")
        _write_pgm(p, gray)
        np.testing.assert_array_equal(native.decode_image(p), gray)

    def test_sniff_without_extension(self, lib, tmp_path, gray):
        p = str(tmp_path / "mystery.dat")
        _write_png_gray(p, gray)
        np.testing.assert_array_equal(native.decode_image(p), gray)

    def test_missing_file_raises(self, lib, tmp_path):
        with pytest.raises(IOError):
            native.decode_image(str(tmp_path / "nope.png"))


class TestBatch:
    def test_threaded_batch_with_resize(self, lib, tmp_path, rng):
        paths = []
        imgs = []
        for i in range(6):
            a = rng.integers(0, 256, (32 + i, 48), dtype=np.uint8)
            p = str(tmp_path / f"b{i}.png")
            _write_png_gray(p, a)
            paths.append(p)
            imgs.append(a)
        out = native.load_batch(paths, (32, 48), n_threads=3)
        assert out.shape == (6, 32, 48)
        np.testing.assert_array_equal(out[0], imgs[0])  # exact size: no resize
        # resized entries follow the torch-nearest convention
        a = imgs[3]  # 35x48 -> 32x48
        rows = (np.arange(32) * 35) // 32
        np.testing.assert_array_equal(out[3], a[rows])

    def test_datasets_use_native(self, lib, tmp_path, rng):
        from octave_tpu.data.datasets import ImageFolderOcta

        img_d = tmp_path / "img"
        gt_d = tmp_path / "gt"
        img_d.mkdir()
        gt_d.mkdir()
        for i in range(3):
            _write_png_gray(str(img_d / f"{i}.png"),
                            rng.integers(0, 256, (20, 20), dtype=np.uint8))
            _write_png_gray(str(gt_d / f"{i}.png"),
                            (rng.integers(0, 2, (20, 20), dtype=np.uint8) * 255))
        ds = ImageFolderOcta(str(img_d), str(gt_d))
        s = ds[0]
        assert s.image.shape == (20, 20)
        assert set(np.unique(s.mask)) <= {0, 1}
        assert set(np.unique(s.scribble)) <= {0, 1, 2}


class TestMalformedFiles:
    """Corrupt headers must fail cleanly — never OOB reads, bad_alloc
    aborts, or uncaught exceptions in pool threads (ADVICE r1)."""

    def test_bmp_truncated_palette(self, lib, tmp_path, gray):
        # 8bpp BMP whose header claims pixel data right after a palette
        # that isn't actually in the file (classic OOB heap-read shape)
        h, w = 4, 4
        rows = bytes(16)
        # data_off points just past the 54-byte headers: NO palette present
        header = (b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
                  + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(rows), 0, 0, 256, 0))
        p = str(tmp_path / "nopal.bmp")
        with open(p, "wb") as f:
            f.write(header + rows)
        with pytest.raises(IOError):
            native.decode_image(p)

    def test_bmp_huge_dims_rejected(self, lib, tmp_path):
        # header claims a 2**20 x 2**20 image in a 60-byte file: must fail
        # before any allocation, not throw bad_alloc in a worker thread
        header = (b"BM" + struct.pack("<IHHI", 60, 0, 0, 1078)
                  + struct.pack("<IiiHHIIiiII", 40, 1 << 20, 1 << 20, 1, 8, 0, 0, 0, 0, 256, 0))
        p = str(tmp_path / "huge.bmp")
        with open(p, "wb") as f:
            f.write(header + bytes(6))
        with pytest.raises(IOError):
            native.decode_image(p)

    def test_bmp_data_offset_past_eof(self, lib, tmp_path):
        header = (b"BM" + struct.pack("<IHHI", 60, 0, 0, 1 << 30)
                  + struct.pack("<IiiHHIIiiII", 40, 4, 4, 1, 24, 0, 0, 0, 0, 0, 0))
        p = str(tmp_path / "offeof.bmp")
        with open(p, "wb") as f:
            f.write(header + bytes(6))
        with pytest.raises(IOError):
            native.decode_image(p)

    def test_pgm_absurd_dims_rejected(self, lib, tmp_path):
        p = str(tmp_path / "huge.pgm")
        with open(p, "wb") as f:
            f.write(b"P5 999999999 999999999 255\n")
        with pytest.raises(IOError):
            native.decode_image(p)

    def test_batch_with_corrupt_file_counts_failure(self, lib, tmp_path, gray):
        """A corrupt file in a threaded batch = zeroed slot + failure count,
        and the process survives."""
        good = str(tmp_path / "good.pgm")
        _write_pgm(good, gray)
        bad = str(tmp_path / "bad.bmp")
        header = (b"BM" + struct.pack("<IHHI", 60, 0, 0, 54)
                  + struct.pack("<IiiHHIIiiII", 40, 1 << 20, 1 << 20, 1, 8, 0, 0, 0, 0, 256, 0))
        with open(bad, "wb") as f:
            f.write(header + bytes(6))
        with pytest.raises(IOError):
            native.load_batch([good, bad], (16, 16))


class TestPythonFallbackBatch:
    def test_load_image_batch_matches_native(self, lib, tmp_path, rng):
        """datasets.load_image_batch python fallback == native loader pixels
        (same grayscale + nearest-resize semantics); the cli predict path
        must never silently produce zeros (ADVICE r1)."""
        from octave_tpu.data import datasets as dsm

        paths = []
        for i in range(3):
            arr = rng.integers(0, 256, (21 + i, 33 - i), dtype=np.uint8)
            p = str(tmp_path / f"i{i}.pgm")
            _write_pgm(p, arr)
            paths.append(p)
        want = native.load_batch(paths, (16, 16))

        # force the python fallback by patching availability
        import unittest.mock as mock

        with mock.patch.object(native, "available", lambda: False):
            pytest.importorskip("PIL")
            got = dsm.load_image_batch(paths, (16, 16))
        np.testing.assert_array_equal(got, want)
