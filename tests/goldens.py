"""Torch-free golden-fixture protocol (VERDICT r3 item 5).

The parity suite (tests/test_parity_*.py) proves runtime equivalence against
the live torch reference — but silently skips wherever torch or the
reference tree is absent. The golden pack future-proofs that claim: the
fixtures in tests/golden/*.npz hold the REFERENCE's fp32 outputs at fixed
seeds, and tests/test_golden.py re-checks this package against them with no
torch import.

Weights are not stored (a full ResnestUNet is ~143 MB even in bf16).
Instead both sides derive them from a DETERMINISTIC FILL over the torch
state-dict key manifest (stored in the npz, a few KB):

  * the generator (tests/golden/generate.py, needs torch + /root/reference)
    fills the reference module's state_dict via `fill_state_dict` and
    records its outputs;
  * the test reconstructs the identical numpy state dict from the manifest
    with the same `fill_state_dict`, converts it through the production
    converter (utils/torch_convert.py — pure numpy), and compares.

The fill is keyed by zlib.crc32 of the state-dict key — stable across
processes, Python versions, and PYTHONHASHSEED (unlike hash()).
"""
from __future__ import annotations

import json
import os
import zlib
from typing import Dict, List, Sequence, Tuple

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def fill_value(key: str, shape: Sequence[int]) -> np.ndarray:
    """Deterministic, key-addressed parameter fill with sane statistics:
    fan-in-scaled weights (activations neither explode nor vanish through
    50+ layers), positive BN running_var, near-identity BN affine."""
    shape = tuple(int(s) for s in shape)
    rng = np.random.default_rng(zlib.crc32(key.encode("utf-8")))
    leaf = key.rsplit(".", 1)[-1]
    if leaf == "num_batches_tracked":
        return np.zeros(shape, np.int64)
    if leaf == "running_var":
        return (0.5 + rng.uniform(0.0, 1.0, shape)).astype(np.float32)
    if leaf == "running_mean":
        return (0.1 * rng.standard_normal(shape)).astype(np.float32)
    if leaf in ("weight_u", "weight_v"):
        v = rng.standard_normal(shape).astype(np.float32)
        return v / max(np.linalg.norm(v), 1e-12)
    if len(shape) >= 2:  # conv / dense weights: He-style fan-in scaling
        fan_in = int(np.prod(shape[1:]))
        return (rng.standard_normal(shape) / np.sqrt(fan_in)).astype(np.float32)
    if leaf == "weight":  # 1-D weight == BN scale
        return (0.8 + 0.4 * rng.uniform(0.0, 1.0, shape)).astype(np.float32)
    return (0.05 * rng.standard_normal(shape)).astype(np.float32)  # biases


def fill_state_dict(manifest: Dict[str, Tuple[int, ...]]) -> Dict[str, np.ndarray]:
    return {k: fill_value(k, shp) for k, shp in manifest.items()}


def input_array(seed: int, shape: Sequence[int]) -> np.ndarray:
    """Shared NCHW float32 input (the generator transposes for torch; the
    test transposes to NHWC)."""
    return np.random.default_rng(seed).standard_normal(
        tuple(int(s) for s in shape)
    ).astype(np.float32)


def save_fixture(name: str, manifest: Dict[str, Tuple[int, ...]],
                 meta: Dict, outputs: Dict[str, np.ndarray]) -> str:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    payload = {
        "__manifest__": np.frombuffer(
            json.dumps({k: list(v) for k, v in manifest.items()}).encode(),
            dtype=np.uint8,
        ),
        "__meta__": np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
    }
    for k, v in outputs.items():
        payload[f"out:{k}"] = np.asarray(v, np.float32)
    np.savez_compressed(path, **payload)
    return path


def loss_inputs() -> Dict[str, np.ndarray]:
    """The shared (generator + test) input set for the loss-stack fixture.
    All NCHW float32, mirroring tests/test_losses.py's case geometry."""
    rng = np.random.default_rng(2024)
    y_hat = rng.uniform(0.01, 1.0, (2, 3, 8, 8)).astype(np.float32)
    y_hat /= y_hat.sum(axis=1, keepdims=True)
    ys = (rng.uniform(0, 1, (2, 3, 8, 8)) > 0.7).astype(np.float32)
    y_hat2 = rng.uniform(0.01, 1.0, (1, 2, 4, 4)).astype(np.float32)
    y_hat2 /= y_hat2.sum(axis=1, keepdims=True)
    ys2 = (rng.uniform(0, 1, (1, 2, 4, 4)) > 0.5).astype(np.float32)
    dice_x = rng.uniform(0, 1, (3, 2, 6, 6)).astype(np.float32)
    dice_y = (rng.uniform(0, 1, (3, 2, 6, 6)) > 0.5).astype(np.float32)
    mse_a = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
    mse_b = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
    atts = {}
    for s in (16, 8, 4, 2):
        a = rng.uniform(0.01, 1.0, (2, 3, s, s)).astype(np.float32)
        a /= a.sum(axis=1, keepdims=True)
        atts[f"att{s}"] = a
    logits = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
    y_true = np.eye(3, dtype=np.float32)[rng.integers(0, 3, (2, 4, 4))]
    y_true = y_true.transpose(0, 3, 1, 2).copy()
    ce_w = np.array([0.2, 1.0, 2.0], np.float32)
    gan_r = rng.standard_normal((4, 1)).astype(np.float32)
    gan_f = rng.standard_normal((4, 1)).astype(np.float32)
    return {
        "wpce_yhat": y_hat, "wpce_ys": ys,
        "wpce2_yhat": y_hat2, "wpce2_ys": ys2,
        "dice_x": dice_x, "dice_y": dice_y,
        "mse_a": mse_a, "mse_b": mse_b,
        **atts,
        "ce_logits": logits, "ce_ytrue": y_true, "ce_w": ce_w,
        "gan_r": gan_r, "gan_f": gan_f,
    }


def disc_pyramid(seed: int, b: int, c: int, h: int, w: int,
                 depth: int) -> List[np.ndarray]:
    rng = np.random.default_rng(seed)
    return [
        rng.uniform(0, 1, (b, c, h // 2**i, w // 2**i)).astype(np.float32)
        for i in range(depth + 1)
    ]


def load_fixture(name: str):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    data = np.load(path)
    manifest = {
        k: tuple(v)
        for k, v in json.loads(bytes(data["__manifest__"]).decode()).items()
    }
    meta = json.loads(bytes(data["__meta__"]).decode())
    outputs = {k[len("out:"):]: data[k] for k in data.files if k.startswith("out:")}
    return manifest, meta, outputs
