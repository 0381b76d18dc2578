"""End-to-end fixture-tree tests for the REAL dataset layouts (VERDICT r3
item 7): build the on-disk ROSE / OCTA-500 directory trees the loaders
document (data/datasets.py:7-14, reference README.md:45) in tmp_path, then
drive one train step + one dataset eval through the Trainer — the exact code
paths real data hits first, including the rose(dual=True) thick/thin
scribble routing into `scribble_onehot_c` and the second-head losses
(data/datasets.py:182-206, train/steps.py:225-232).
"""
import struct
import zlib

import numpy as np
import pytest


def _write_png_gray(path, arr):
    """Minimal 8-bit grayscale PNG writer (filter 0 rows)."""
    h, w = arr.shape
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def _vessel_like(rng, hw, seed_mask=None):
    """A small grayscale image + thick/thin masks with vessel-ish structure."""
    h = w = hw
    mask = np.zeros((h, w), np.uint8)
    for _ in range(3):
        x = int(rng.integers(2, w - 3))
        mask[:, max(0, x - 1):x + 2] = 1  # 3px vertical 'vessel'
    thin = np.zeros_like(mask)
    thin[:, np.where(mask.any(0))[0][1::3]] = mask[:, np.where(mask.any(0))[0][1::3]]
    img = (rng.uniform(30, 90, (h, w)) + mask * 120).clip(0, 255).astype(np.uint8)
    return img, mask * 255, thin * 255


def _build_rose(tmp_path, n_train=4, n_test=2, hw=40, dual=True):
    rng = np.random.default_rng(7)
    base = tmp_path / "ROSE-1" / "SVC"
    for split, n in (("train", n_train), ("test", n_test)):
        dirs = ["img", "gt"]
        if split == "train":
            dirs += ["thin_gt"] + (["thick_gt"] if dual else [])
        for d in dirs:
            (base / split / d).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img, thick, thin = _vessel_like(rng, hw)
            _write_png_gray(str(base / split / "img" / f"{i:02d}.png"), img)
            _write_png_gray(str(base / split / "gt" / f"{i:02d}.png"), thick)
            if split == "train":
                _write_png_gray(str(base / split / "thin_gt" / f"{i:02d}.png"), thin)
                if dual:
                    _write_png_gray(str(base / split / "thick_gt" / f"{i:02d}.png"),
                                    thick)
    return str(tmp_path)


def _build_octa500(tmp_path, n=3, hw=40):
    rng = np.random.default_rng(9)
    for split in ("train", "test"):
        for d in ("img", "gt"):
            (tmp_path / "OCTA_3M" / split / d).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img, thick, _ = _vessel_like(rng, hw)
            _write_png_gray(str(tmp_path / "OCTA_3M" / split / "img" / f"{i}.png"), img)
            _write_png_gray(str(tmp_path / "OCTA_3M" / split / "gt" / f"{i}.png"), thick)
    return str(tmp_path)


class TestRoseLayout:
    def test_single_head_loader(self, tmp_path):
        from octave_tpu.data import datasets as ds

        root = _build_rose(tmp_path, dual=False)
        d = ds.rose(root, "ROSE-1/SVC", "train", dual=False)
        assert len(d) == 4
        s = d[0]
        assert s.image.dtype == np.uint8 and s.image.shape == (40, 40)
        # thin_gt routed as THE scribble (weak supervision), class 2 = vessel
        assert set(np.unique(s.scribble)) <= {0, 2}
        assert s.scribble_c is None
        assert set(np.unique(s.mask)) <= {0, 1}

    def test_dual_loader_routes_thick_and_thin(self, tmp_path):
        from octave_tpu.data import datasets as ds

        root = _build_rose(tmp_path, dual=True)
        d = ds.rose(root, "ROSE-1/SVC", "train", dual=True)
        s = d[0]
        # head 0 (deep decoder) ← thick_gt as scribble, head 1 ← thin_gt
        assert s.scribble_c is not None
        assert (s.scribble == 2).sum() >= (s.scribble_c == 2).sum()
        assert set(np.unique(s.scribble_c)) <= {0, 2}
        # the batcher forwards scribble_c only when every sample has one
        batch = next(ds.batch_iterator(d, 2, seed=0))
        assert batch["scribble_c"].shape == (2, 40, 40)

    @pytest.mark.slow
    def test_dual_head_train_step_and_eval(self, tmp_path):
        """rose(dual=True) → ParallelHeadAttentionGate one train step + one
        dataset eval: the thin/thick targets must flow into
        scribble_onehot_c / second-head losses without shape or key errors,
        with the on-disk 40² images resized to the configured 48²
        (odd-pad geometry)."""
        from octave_tpu.train.trainer import Trainer
        from octave_tpu.utils.config import Config

        root = _build_rose(tmp_path, dual=True)
        cfg = Config.from_dict({
            "model": {"architecture": "parallel_head_gate",
                      "discriminator_depth": 2, "num_filters": 8,
                      "segmentor_gating_level": 2},
            "data": {"dataset": "rose", "root": root, "subset": "ROSE-1/SVC",
                     "image_size": (48, 48), "batch_size": 2},
            "train": {"steps": 1, "eval_every": 0, "log_every": 0},
        })
        tr = Trainer(cfg)
        state = tr.fit()
        assert int(state.step) == 1
        m = tr.evaluate(state)
        assert 0.0 <= m["dice"] <= 1.0 and 0.0 <= m["auc"] <= 1.0
        assert np.isfinite(list(m.values())).all()

    @pytest.mark.slow
    def test_single_head_train_step_and_eval(self, tmp_path):
        from octave_tpu.train.trainer import Trainer
        from octave_tpu.utils.config import Config

        root = _build_rose(tmp_path, dual=False)
        cfg = Config.from_dict({
            "model": {"discriminator_depth": 2, "num_filters": 8},
            "data": {"dataset": "rose", "root": root, "subset": "ROSE-1/SVC",
                     "image_size": (32, 32), "batch_size": 2},
            "train": {"steps": 1, "eval_every": 0, "log_every": 0},
        })
        tr = Trainer(cfg)
        state = tr.fit()
        assert int(state.step) == 1
        m = tr.evaluate(state)
        assert np.isfinite(list(m.values())).all()


class TestOcta500Layout:
    def test_loader(self, tmp_path):
        from octave_tpu.data import datasets as ds

        root = _build_octa500(tmp_path)
        d = ds.octa500(root, "3M", "test")
        assert len(d) == 3
        s = d[1]
        assert s.image.shape == (40, 40)
        # no scribble dirs → synthesized centerline weak labels (classes 1/2)
        assert set(np.unique(s.scribble)) <= {0, 1, 2}

    @pytest.mark.slow
    def test_eval_through_trainer(self, tmp_path):
        from octave_tpu.train.trainer import Trainer
        from octave_tpu.utils.config import Config

        root = _build_octa500(tmp_path)
        cfg = Config.from_dict({
            "model": {"discriminator_depth": 0, "num_filters": 8},
            "data": {"dataset": "octa500", "root": root, "subset": "3M",
                     "image_size": (32, 32), "batch_size": 2},
            "train": {"steps": 0, "eval_every": 0, "log_every": 0},
        })
        tr = Trainer(cfg)
        m = tr.evaluate(tr.init_state())
        assert np.isfinite(list(m.values())).all()
