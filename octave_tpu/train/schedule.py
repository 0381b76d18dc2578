"""LR schedules and optimizer factories.

The reference pins `pytorch-polynomial-lr-decay` for its off-tree harness
(reference requirements.txt:25); optax's polynomial schedule is the native
equivalent.
"""
from __future__ import annotations

from typing import Optional

import optax


def polynomial_decay(
    init_lr: float,
    end_lr: float = 1e-6,
    decay_steps: int = 10_000,
    power: float = 0.9,
) -> optax.Schedule:
    """new_lr = (init - end) * (1 - step/decay_steps)^power + end — the
    pytorch-polynomial-lr-decay formula."""
    return optax.polynomial_schedule(
        init_value=init_lr, end_value=end_lr, power=power,
        transition_steps=decay_steps,
    )


def make_optimizer(
    lr: float = 1e-4,
    *,
    schedule: Optional[optax.Schedule] = None,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    grad_clip: Optional[float] = None,
    moment_dtype: Optional[str] = None,
) -> optax.GradientTransformation:
    """Adam(W) with optional polynomial decay and clip — the standard GAN
    optimizer pair for both segmentor and discriminator.

    moment_dtype ('bfloat16'): store Adam's FIRST moment in reduced
    precision (optax mu_dtype). The second moment stays f32 — its values
    span many orders of magnitude and bf16's 8-bit mantissa would distort
    the effective per-parameter LR. Saves one f32 params-sized buffer of
    HBM and halves mu's read/write traffic in the update pass.
    """
    lr_or_sched = schedule if schedule is not None else lr
    mu = None if moment_dtype is None else moment_dtype
    chain = []
    if grad_clip is not None:
        chain.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay > 0:
        chain.append(optax.adamw(lr_or_sched, b1=b1, b2=b2,
                                 weight_decay=weight_decay, mu_dtype=mu))
    else:
        chain.append(optax.adam(lr_or_sched, b1=b1, b2=b2, mu_dtype=mu))
    return optax.chain(*chain)
