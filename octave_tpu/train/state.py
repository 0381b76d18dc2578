"""Train state: parameters, mutable collections, and two optimizer states.

The reference leaves training to the user (its facade forward raises
NotImplementedError, reference octa.py:59-60; README tells users to wire a
torch loop, README.md:28-36). This is the framework-supplied equivalent —
one flax.struct pytree carrying everything a GAN step mutates, so the whole
step jits as a single XLA graph and checkpoints as one orbax item.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    seg_params: Any
    disc_params: Any
    batch_stats: Any
    spectral: Any
    seg_opt_state: Any
    disc_opt_state: Any
    rng: jax.Array
    seg_tx: optax.GradientTransformation = struct.field(pytree_node=False)
    disc_tx: Optional[optax.GradientTransformation] = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(
        cls,
        *,
        seg_params,
        disc_params=None,
        batch_stats=None,
        spectral=None,
        seg_tx: optax.GradientTransformation,
        disc_tx: Optional[optax.GradientTransformation] = None,
        rng: Optional[jax.Array] = None,
    ) -> "TrainState":
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            seg_params=seg_params,
            disc_params=disc_params,
            batch_stats=batch_stats or {},
            spectral=spectral or {},
            seg_opt_state=seg_tx.init(seg_params),
            disc_opt_state=disc_tx.init(disc_params) if disc_tx is not None and disc_params is not None else None,
            rng=rng if rng is not None else jax.random.PRNGKey(0),
            seg_tx=seg_tx,
            disc_tx=disc_tx,
        )
