"""Orbax checkpointing: save/restore the full TrainState (params, two optax
states, BN stats, spectral-norm u/v, PRNG key) with async writes and
keep-latest retention.

The reference's only checkpoint IO is torch.load of pretrained backbone
weights (reference extra/resnest.py:456-458); save/resume is part of the
off-tree harness this framework supplies (SURVEY.md §5). Preemption-safe:
`save` is async (TPU maintenance windows don't lose steps) and `restore_latest`
resumes from the newest complete step.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax


class CheckpointManager:
    """Thin wrapper over orbax.checkpoint.CheckpointManager for TrainState
    pytrees."""

    def __init__(self, directory: str, max_to_keep: int = 3, save_interval_steps: int = 1):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                enable_async_checkpointing=True,
            ),
        )

    def save(self, step: int, state: Any) -> bool:
        """Async-save the (pytree-only part of the) train state."""
        return self.manager.save(
            step, args=self._ocp.args.StandardSave(jax.tree.map(lambda x: x, state))
        )

    def restore_latest(self, abstract_state: Any) -> Optional[Any]:
        """Restore the newest step into the structure of `abstract_state`
        (pass the freshly-created TrainState; returns None if no checkpoint)."""
        step = self.manager.latest_step()
        if step is None:
            return None
        return self.manager.restore(
            step, args=self._ocp.args.StandardRestore(abstract_state)
        )

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def close(self) -> None:
        self.manager.close()


def save_pytree(path: str, tree: Any) -> None:
    """One-shot synchronous pytree save (e.g. converted pretrained weights)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def load_pytree(path: str, abstract_tree: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if abstract_tree is not None:
        return ckptr.restore(os.path.abspath(path), abstract_tree)
    return ckptr.restore(os.path.abspath(path))


# ---------------------------------------------------------------------------
# Compact committed-weights format (serving halves only).
#
# A single .npz small enough to live in git, so the driver bench and a clean
# checkout can always serve the SAME trained weights the accuracy artifacts
# validate (VERDICT r3 item 1). float32 leaves are stored as bfloat16 bit
# patterns (uint16) — the serving path computes in bf16 anyway, so this is
# lossless for inference; everything else round-trips exactly.

_BF16_PREFIX = "bf16:"
_RAW_PREFIX = "raw:"
_SEP = "/"


def _flatten(tree: Any, prefix: str = "") -> Any:
    import numpy as np

    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, f"{prefix}{_SEP}{k}" if prefix else str(k))
    else:
        yield prefix, np.asarray(tree)


def _shard_paths(path: str, n: int):
    base = path[:-4] if path.endswith(".npz") else path
    return [f"{base}-shard{i}-of-{n}.npz" for i in range(n)]


def export_weights_npz(path: str, variables: Any,
                       max_bytes: int | None = None) -> None:
    """Save {"params": ..., "batch_stats": ...} (any nested dict-of-arrays)
    as a compact npz: float32 → bf16 bit patterns, other dtypes verbatim.

    With `max_bytes`, the leaves are greedily partitioned into shards whose
    UNCOMPRESSED payload stays under the cap (bf16 weight noise is nearly
    incompressible, so raw bytes upper-bound the file size) and written as
    `<base>-shard{i}-of-{n}.npz` instead of one file — keeps each committed
    blob under GitHub's 100 MB hard per-file limit. `load_weights_npz(path)`
    finds and merges the shards transparently."""
    import glob as _glob

    import ml_dtypes
    import numpy as np

    out = {}
    for key, arr in _flatten(variables):
        if arr.dtype == np.float32 or str(arr.dtype) == "bfloat16":
            out[_BF16_PREFIX + key] = arr.astype(ml_dtypes.bfloat16).view(np.uint16)
        else:
            out[_RAW_PREFIX + key] = arr
    if max_bytes is None:
        np.savez_compressed(path, **out)
        return
    shards: list = [{}]
    sizes = [0]
    for key in sorted(out):  # deterministic partition
        nb = out[key].nbytes
        if sizes[-1] and sizes[-1] + nb > max_bytes:
            shards.append({})
            sizes.append(0)
        shards[-1][key] = out[key]
        sizes[-1] += nb
    base = path[:-4] if path.endswith(".npz") else path
    for stale in _glob.glob(f"{base}-shard*-of-*.npz"):
        os.remove(stale)
    for p, shard in zip(_shard_paths(path, len(shards)), shards):
        np.savez_compressed(p, **shard)


def load_weights_npz(path: str) -> Any:
    """Inverse of export_weights_npz: nested dict with float32 leaves.

    Accepts either a single npz or the logical path of a sharded export
    (loads and merges `<base>-shard{i}-of-{n}.npz`)."""
    import glob as _glob

    import ml_dtypes
    import numpy as np

    if os.path.exists(path):
        sources = [np.load(path)]
    else:
        base = path[:-4] if path.endswith(".npz") else path
        found = sorted(_glob.glob(f"{base}-shard*-of-*.npz"))
        if not found:
            raise FileNotFoundError(path)
        n = int(found[0].rsplit("-of-", 1)[1][:-4])
        expect = _shard_paths(path, n)
        if found != expect:
            raise FileNotFoundError(
                f"incomplete shard set for {path}: found {found}, "
                f"expected {expect}")
        sources = [np.load(p) for p in found]
    tree: dict = {}
    for data in sources:
        for full in data.files:
            if full.startswith(_BF16_PREFIX):
                key, arr = full[len(_BF16_PREFIX):], data[full]
                arr = arr.view(ml_dtypes.bfloat16).astype(np.float32)
            elif full.startswith(_RAW_PREFIX):
                key, arr = full[len(_RAW_PREFIX):], data[full]
            else:  # pragma: no cover - defensive
                raise ValueError(f"unknown npz key prefix: {full!r}")
            node = tree
            parts = key.split(_SEP)
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = arr
    return tree
