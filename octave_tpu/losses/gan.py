"""LSGAN losses with the reference's +1/-1 targets.

/root/reference/architectures/discriminator/losses.py:6-24 uses least-squares
GAN targets of +1 (real) and -1 (fake) — not the textbook 1/0.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ls_discriminator_loss(y_real: jax.Array, y_fake: jax.Array) -> jax.Array:
    """D = 0.5*mean((y_real - 1)^2) + 0.5*mean((y_fake + 1)^2)
    (discriminator/losses.py:12-13)."""
    return 0.5 * jnp.mean(jnp.square(y_real - 1.0)) + 0.5 * jnp.mean(
        jnp.square(y_fake + 1.0)
    )


def ls_generator_loss(y_fake: jax.Array) -> jax.Array:
    """G = 0.5*mean((y_fake - 1)^2) (discriminator/losses.py:23)."""
    return 0.5 * jnp.mean(jnp.square(y_fake - 1.0))


class LSDiscriminatorialLoss:
    """API-parity wrapper (name and misspelling preserved from the
    reference)."""

    def __call__(self, y_real, y_fake):
        return ls_discriminator_loss(y_real, y_fake)


class LSGeneratorLoss:
    def __call__(self, y_fake):
        return ls_generator_loss(y_fake)
