"""CLI predict subcommand: end-to-end directory → probability maps."""
import os

import numpy as np
import pytest

from octave_tpu.cli import main
from octave_tpu.data import native


@pytest.mark.slow
def test_cli_predict_dir(tmp_path, rng):
    if not native.available():
        pytest.skip("native loader unavailable")
    from tests.test_native_loader import _write_png_gray

    img_dir = tmp_path / "imgs"
    out_dir = tmp_path / "out"
    img_dir.mkdir()
    for i in range(3):
        _write_png_gray(str(img_dir / f"im{i}.png"),
                        rng.integers(0, 256, (40, 40), dtype=np.uint8))
    rc = main([
        "predict", "--images", str(img_dir), "--out", str(out_dir),
        "data.image_size=[32,32]", "data.batch_size=2",
    ])
    assert rc == 0
    outs = sorted(os.listdir(out_dir))
    assert outs == ["im0_mask.png", "im0_prob.npy", "im1_mask.png", "im1_prob.npy",
                    "im2_mask.png", "im2_prob.npy"]
    m = native.decode_image(str(out_dir / "im0_mask.png"))
    assert set(np.unique(m)) <= {0, 255}
    p = np.load(out_dir / "im0_prob.npy")
    assert p.shape == (32, 32) and 0.0 <= p.min() and p.max() <= 1.0


@pytest.mark.slow
def test_cli_predict_int8(tmp_path, rng):
    """--int8 PTQ path: same outputs shape/range, calibrated on batch 1."""
    if not native.available():
        pytest.skip("native loader unavailable")
    from tests.test_native_loader import _write_png_gray

    img_dir = tmp_path / "imgs"
    out_dir = tmp_path / "out8"
    img_dir.mkdir()
    for i in range(2):
        _write_png_gray(str(img_dir / f"im{i}.png"),
                        rng.integers(0, 256, (40, 40), dtype=np.uint8))
    rc = main([
        "predict", "--images", str(img_dir), "--out", str(out_dir), "--int8",
        "data.image_size=[32,32]", "data.batch_size=2",
    ])
    assert rc == 0
    p = np.load(out_dir / "im0_prob.npy")
    assert p.shape == (32, 32) and 0.0 <= p.min() and p.max() <= 1.0
