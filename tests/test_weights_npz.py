"""Compact committed-weights npz format (utils/checkpoint.py).

The committed serving weights must round-trip exactly (bf16 bit patterns)
and — since round 5 — shard below GitHub's 100 MB per-file hard limit
(ADVICE r4): export with max_bytes writes `<base>-shard{i}-of-{n}.npz`
pieces that load_weights_npz merges transparently.
"""
import os

import numpy as np
import pytest

from octave_tpu.utils.checkpoint import export_weights_npz, load_weights_npz


def _tree(seed: int = 0):
    rng = np.random.RandomState(seed)
    return {
        "params": {
            "conv": {"kernel": rng.randn(3, 3, 8, 16).astype(np.float32)},
            "bn": {"scale": rng.randn(16).astype(np.float32)},
        },
        "batch_stats": {"bn": {
            "mean": rng.randn(16).astype(np.float32),
            "var": rng.rand(16).astype(np.float32),
            "count": np.asarray(7, np.int64),
        }},
    }


def _assert_bf16_roundtrip(orig, loaded):
    import ml_dtypes

    import jax

    flat_o = jax.tree_util.tree_leaves_with_path(orig)
    flat_l = dict(jax.tree_util.tree_leaves_with_path(loaded))
    assert len(flat_o) == len(flat_l)
    for k, v in flat_o:
        got = flat_l[k]
        if v.dtype == np.float32:
            want = v.astype(ml_dtypes.bfloat16).astype(np.float32)
        else:
            want = v
        assert np.array_equal(want, got), k


def test_single_file_roundtrip(tmp_path):
    tree = _tree()
    path = str(tmp_path / "w.npz")
    export_weights_npz(path, tree)
    assert os.path.isfile(path)
    _assert_bf16_roundtrip(tree, load_weights_npz(path))


def test_sharded_roundtrip(tmp_path):
    tree = _tree(1)
    path = str(tmp_path / "w.npz")
    export_weights_npz(path, tree, max_bytes=1024)  # force several shards
    assert not os.path.exists(path)
    shards = sorted(tmp_path.glob("w-shard*-of-*.npz"))
    assert len(shards) >= 2
    _assert_bf16_roundtrip(tree, load_weights_npz(path))


def test_incomplete_shard_set_raises(tmp_path):
    tree = _tree(2)
    path = str(tmp_path / "w.npz")
    export_weights_npz(path, tree, max_bytes=1024)
    shards = sorted(tmp_path.glob("w-shard*-of-*.npz"))
    os.remove(shards[-1])
    with pytest.raises(FileNotFoundError):
        load_weights_npz(path)


def test_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_weights_npz(str(tmp_path / "nope.npz"))


def test_committed_serving_weights_fit_github_limit():
    """Every committed weights304 blob stays under the 100 MB hard limit."""
    import glob

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    blobs = glob.glob(os.path.join(here, "benchmarks", "weights304*.npz"))
    if not blobs:
        pytest.skip("no committed serving weights in this checkout")
    for b in blobs:
        assert os.path.getsize(b) < 100 * 10**6, b
