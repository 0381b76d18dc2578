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
