"""Device-side jit preprocessing for en-face OCTA imagery.

The reference repo does preprocessing off-tree (host-side torchvision/opencv,
reference requirements.txt:2,14,16); the TPU-native replacement runs the whole
transform chain as jitted device ops so HBM is fed raw uint8 and everything
else fuses into the step graph:

    raw uint8 (b,h,w[,1]) → float [0,1] → resize/pad to target → normalize
    scribble mask uint8 → one-hot (bg/classes) → multi-scale pyramid for the
    discriminator's "real" branch

Targets: ROSE 304², OCTA-500 3M/6M 400² (reference README.md:45,
docs/index.md:19).
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from octave_tpu.ops.common import avg_pool2d, nearest_resize


def to_float(img: jax.Array) -> jax.Array:
    """uint8 → float32 in [0, 1]; float input passes through."""
    if jnp.issubdtype(img.dtype, jnp.floating):
        return img.astype(jnp.float32)
    return img.astype(jnp.float32) / 255.0


def ensure_nhwc(img: jax.Array) -> jax.Array:
    """(b,h,w) → (b,h,w,1)."""
    if img.ndim == 3:
        return img[..., None]
    return img


def normalize_image(
    img: jax.Array,
    mean: Optional[Sequence[float]] = None,
    std: Optional[Sequence[float]] = None,
) -> jax.Array:
    """Channel-wise standardization; defaults to identity (reference trains
    on [0,1] grayscale)."""
    img = to_float(ensure_nhwc(img))
    if mean is not None:
        img = img - jnp.asarray(mean, jnp.float32)
    if std is not None:
        img = img / jnp.asarray(std, jnp.float32)
    return img


def resize_or_pad(img: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Bilinear resize to the target size (static shapes)."""
    b, h, w, c = img.shape
    if (h, w) == size:
        return img
    return jax.image.resize(img, (b, *size, c), method="bilinear")


def grayscale_to_channels(img: jax.Array, channels: int) -> jax.Array:
    """Tile a 1-channel image to `channels` (the ResNeSt stem expects 3)."""
    img = ensure_nhwc(img)
    if img.shape[-1] == channels:
        return img
    assert img.shape[-1] == 1, f"cannot adapt {img.shape[-1]}→{channels} channels"
    return jnp.tile(img, (1, 1, 1, channels))


def scribble_to_onehot(scribble: jax.Array, num_classes: int) -> jax.Array:
    """Scribble label map (b,h,w) int {0=unlabeled/bg-scribble encoding…} →
    one-hot (b,h,w,c).

    Encoding convention (weak supervision): pixel value v in [0, num_classes]
    where 0 = unannotated (contributes nothing — WPCE masks on ys),
    1..num_classes = scribble of class v-1 (class 0 = background scribble).
    """
    v = scribble.astype(jnp.int32)
    onehot = jax.nn.one_hot(v - 1, num_classes, dtype=jnp.float32)
    return jnp.where((v > 0)[..., None], onehot, 0.0)


def mask_to_onehot(mask: jax.Array, num_classes: int) -> jax.Array:
    """Dense binary/label mask (b,h,w) → one-hot (b,h,w,c) incl. background
    channel 0."""
    return jax.nn.one_hot(mask.astype(jnp.int32), num_classes, dtype=jnp.float32)


def mask_pyramid(
    mask: jax.Array, depth: int, method: str = "nearest"
) -> Tuple[jax.Array, ...]:
    """Finest-first multi-scale pyramid of a one-hot mask (b,h,w,c) for the
    discriminator's real branch: level i is h/2^i.

    'nearest' keeps hard {0,1} masks (matches the AAG softmax-map scales the
    critic sees on the fake branch); 'avg' gives soft downsampled masks.
    """
    levels = [mask]
    cur = mask
    for _ in range(depth):
        h, w = cur.shape[1] // 2, cur.shape[2] // 2
        if method == "nearest":
            cur = nearest_resize(cur, (h, w))
        elif method == "avg":
            cur = avg_pool2d(cur, 2, 2, 0)
        else:
            raise ValueError(f"unknown pyramid method: {method}")
        levels.append(cur)
    return tuple(levels)


@functools.partial(
    jax.jit,
    static_argnames=("size", "num_classes", "depth", "in_channels",
                     "augment_intensity"),
)
def prepare_batch(
    image: jax.Array,
    scribble: jax.Array,
    full_mask: jax.Array,
    size: Tuple[int, int] = (304, 304),
    num_classes: int = 2,
    depth: int = 4,
    in_channels: int = 3,
    augment_key: Optional[jax.Array] = None,
    augment_intensity: float = 0.0,
    scribble_c: Optional[jax.Array] = None,
):
    """One fused device-side transform: raw batch → model-ready tensors.

    With `augment_key`, a random per-sample D4 dihedral transform (+optional
    intensity jitter) is applied consistently to image/scribble/mask BEFORE
    the pyramid is built (data/augment.py) — train-time only.

    `scribble_c` is the optional second-head target (the ROSE dual-decoder
    thin-branch scribbles); it rides the same resize/one-hot/augment chain
    and comes back as "scribble_onehot_c".

    Returns dict(image, scribble_onehot, mask_onehot, mask_pyramid
    [, scribble_onehot_c]).
    """
    img = resize_or_pad(normalize_image(image), size)
    img = grayscale_to_channels(img, in_channels)
    # label maps resize with NEAREST (bilinear would invent labels)
    if scribble.shape[1:3] != size:
        scribble = nearest_resize(scribble[..., None], size)[..., 0]
    if full_mask.shape[1:3] != size:
        full_mask = nearest_resize(full_mask[..., None], size)[..., 0]
    scrib = scribble_to_onehot(scribble, num_classes)
    dense = mask_to_onehot(full_mask, num_classes)
    scrib_c = None
    if scribble_c is not None:
        if scribble_c.shape[1:3] != size:
            scribble_c = nearest_resize(scribble_c[..., None], size)[..., 0]
        scrib_c = scribble_to_onehot(scribble_c, num_classes)
    if augment_key is not None:
        from octave_tpu.data.augment import augment

        extras = (scrib_c,) if scrib_c is not None else ()
        out = augment(augment_key, img, scrib, dense,
                      intensity=augment_intensity, extra_labels=extras)
        img, scrib, dense = out[:3]
        if scrib_c is not None:
            scrib_c = out[3]
    pyr = mask_pyramid(dense, depth)
    batch = {
        "image": img,
        "scribble_onehot": scrib,
        "mask_onehot": dense,
        "mask_pyramid": pyr,
    }
    if scrib_c is not None:
        batch["scribble_onehot_c"] = scrib_c
    return batch
