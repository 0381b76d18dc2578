"""Jitted device-side training augmentation.

The reference trains with augmentation in its off-tree Lightning harness
(kornia is pinned at /root/reference/requirements.txt:16 for exactly this);
here it is a TPU-native, fully batched transform: per-sample random D4
dihedral transforms (flips + 90° rotations — the full symmetry group of
en-face angiograms, which have no canonical orientation) plus optional
intensity jitter, all static-shaped and jit-friendly.

Geometric transforms are applied consistently to every spatial tensor of a
sample (image, scribble one-hot, dense mask) BEFORE the discriminator mask
pyramid is built (preprocess.prepare_batch), so the pyramid is exactly the
pyramid of the augmented mask — flipping pyramid levels after the fact
would NOT commute with ::2 nearest downsampling.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def random_dihedral(key: jax.Array, *tensors: jax.Array) -> Tuple[jax.Array, ...]:
    """Apply one random D4 symmetry per sample, identically to every tensor.

    Tensors are (b, h, w, c) with the same b/h/w; h == w is required when
    the rotation component is used (all target sizes here are square).
    D4 element = (rot90^r, flip) encoded as 3 random bits per sample.
    """
    b = tensors[0].shape[0]
    kf, kv, kr = jax.random.split(key, 3)
    flip_h = jax.random.bernoulli(kf, 0.5, (b,))
    flip_v = jax.random.bernoulli(kv, 0.5, (b,))
    rot = jax.random.bernoulli(kr, 0.5, (b,))

    def apply(x: jax.Array) -> jax.Array:
        f = lambda m: m[:, None, None, None]
        x = jnp.where(f(flip_h), x[:, :, ::-1, :], x)
        x = jnp.where(f(flip_v), x[:, ::-1, :, :], x)
        # rot90 requires square spatial dims (transpose preserves shape)
        if x.shape[1] == x.shape[2]:
            x = jnp.where(f(rot), jnp.transpose(x, (0, 2, 1, 3))[:, :, ::-1, :], x)
        return x

    return tuple(apply(t) for t in tensors)


def intensity_jitter(
    key: jax.Array,
    image: jax.Array,
    brightness: float = 0.1,
    contrast: float = 0.1,
) -> jax.Array:
    """Per-sample brightness/contrast jitter on [0, 1] images:
    ``clip((x - mean) * (1 + c) + mean + b)`` with b ~ U(±brightness),
    c ~ U(±contrast). Labels are never touched."""
    b = image.shape[0]
    kb, kc = jax.random.split(key)
    db = jax.random.uniform(kb, (b, 1, 1, 1), image.dtype, -brightness, brightness)
    dc = jax.random.uniform(kc, (b, 1, 1, 1), image.dtype, -contrast, contrast)
    mean = jnp.mean(image, axis=(1, 2, 3), keepdims=True)
    return jnp.clip((image - mean) * (1.0 + dc) + mean + db, 0.0, 1.0)


def augment(
    key: jax.Array,
    image: jax.Array,
    scribble_onehot: jax.Array,
    mask_onehot: jax.Array,
    intensity: float = 0.0,
):
    """One fused augmentation step for a prepared (pre-pyramid) batch.
    Returns (image, scribble_onehot, mask_onehot) transformed consistently."""
    kg, ki = jax.random.split(key)
    image, scribble_onehot, mask_onehot = random_dihedral(
        kg, image, scribble_onehot, mask_onehot
    )
    if intensity > 0.0:
        image = intensity_jitter(ki, image, intensity, intensity)
    return image, scribble_onehot, mask_onehot
