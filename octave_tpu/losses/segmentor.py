"""Weakly-supervised segmentation losses (pure JAX functions).

Bit-faithful reimplementations of
/root/reference/architectures/segmentor/losses.py. All functions take NHWC
tensors (TPU-native layout) — the math is layout-independent since every loss
reduces over pixels and channels.

Each loss is a pure function (jit/grad/vmap-composable); thin class wrappers
at the bottom mirror the reference's constructor surface 1:1 for API parity.
"""
from __future__ import annotations

from typing import Literal, Optional, Sequence

import jax
import jax.numpy as jnp

from octave_tpu.ops.common import nearest_resize

_EPS = 1e-12


def weighted_partial_ce(
    y_hat: jax.Array,
    ys: jax.Array,
    num_classes: int,
    manual: bool = True,
    ignore_bg: bool = False,
    reduction: Literal["mean", "sum"] = "mean",
    full: bool = False,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Weighted Partial Cross-Entropy over scribble pixels (losses.py:11-61).

    y_hat: (b,h,w,c) class probabilities (manual mode) or logits (torch-CE
           fallback mode); ys: (b,h,w,c) scribble one-hot.

    Class weights w_c = n_tot / (n_c + 1e-12) where n_c counts scribble pixels
    per class *including the background channel* (losses.py:35-38 — reference
    quirk, preserved). Unless full=True, y_hat is masked to annotated pixels.
    """
    assert y_hat.shape[-1] == ys.shape[-1], "Number of class mismatch."
    if ignore_bg:
        ys = ys.at[..., 0].set(0)
    if not full:
        y_hat = y_hat * ys

    ni = jnp.sum(ys, axis=(0, 1, 2))  # (c,)
    if axis_name is not None:
        # under a data mesh, class weights come from the GLOBAL scribble
        # counts so the sharded loss equals the full-batch loss exactly
        # (per-device counts would reproduce DDP's slightly-divergent stats)
        ni = jax.lax.psum(ni, axis_name)
    n_tot = jnp.sum(ni)
    weights = n_tot / (ni + _EPS)  # (c,)

    if num_classes == 1:
        # BCEWithLogits fallback (losses.py:48-49)
        z = y_hat.reshape(-1)
        t = ys.reshape(-1)
        bce = jnp.maximum(z, 0) - z * t + jnp.log1p(jnp.exp(-jnp.abs(z)))
        return jnp.mean(bce)

    if manual:
        # wce = mean/sum over pixels of -sum_c w_c * ys_c * log(y_hat_c + eps)
        ll = weights * ys * jnp.log(y_hat + _EPS)
        per_pixel = -jnp.sum(ll, axis=-1)  # (b,h,w)
        if reduction == "mean":
            return jnp.mean(per_pixel)
        return jnp.sum(per_pixel)

    # torch nn.CrossEntropyLoss fallback after dropping bg channel
    # (losses.py:41,45,58): logits y_hat (b,h,w,c); targets = flattened ys
    # without bg — the reference flattens one-hot to class indices implicitly
    # via long(); faithful equivalent: standard mean CE on logits with the
    # flattened fg mask as integer targets.
    logits = y_hat.reshape(-1, y_hat.shape[-1])
    targets = ys[..., 1:].reshape(-1).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def dice_loss(inputs: jax.Array, targets: jax.Array, eps: float = _EPS) -> jax.Array:
    """Soft Dice (losses.py:64-74): per-batch-item, cardinality = x + y
    (not squared), mean over batch."""
    axes = tuple(range(1, inputs.ndim))
    intersect = jnp.sum(inputs * targets, axis=axes)
    cardinal = jnp.sum(inputs + targets, axis=axes)
    return jnp.mean(-(2.0 * intersect / (cardinal + eps)) + 1.0)


def image_mse_loss(y_h: jax.Array, y: jax.Array) -> jax.Array:
    """Flattened-MSE (losses.py:77-87)."""
    return jnp.mean(jnp.square(y_h.reshape(-1) - y.reshape(-1).astype(y_h.dtype)))


def _sum_pool(x: jax.Array, factor: int) -> jax.Array:
    """Sum over non-overlapping factor×factor blocks (NHWC)."""
    b, h, w, c = x.shape
    return jnp.sum(
        x.reshape(b, h // factor, factor, w // factor, factor, c), axis=(2, 4)
    )


def interlayer_divergence_pooled(
    attentions: Sequence[jax.Array],
    weights: Optional[Sequence[float]] = None,
    stop_gradient: bool = False,
) -> jax.Array:
    """Bandwidth-optimal KLD-mode ILD, exactly equal (mod fp reassociation)
    to interlayer_divergence when every deeper map's scale divides the basis.

    Key identity: nearest upscale by an integer factor is `repeat`, so
        Σ_p basis(p)·log(resize(att)*w)(p) = Σ_s sumpool(basis)(s)·log(att*w)(s)
    — no full-resolution posterior is ever materialized (saves
    (len(attentions)-1) full-res tensor reads+writes per step).
    """
    basis = jax.lax.stop_gradient(attentions[0]) if stop_gradient else attentions[0]
    h, w = basis.shape[1], basis.shape[2]
    rest = list(attentions[1:])
    if weights is None:
        weights = [1 for _ in rest]
    else:
        weights = list(weights)
        if len(weights) != len(rest):
            weights = weights[: len(attentions)]

    n_pix = basis.shape[0] * h * w
    # Σ_p basis·log(basis)
    ent = jnp.sum(basis * jnp.log(basis + _EPS))
    cross = 0.0
    for att, weight in zip(rest, weights):
        if weight == 0:
            continue
        ah, aw = att.shape[1], att.shape[2]
        assert h % ah == 0 and w % aw == 0, "pooled ILD needs integer scales"
        fb = _sum_pool(basis, h // ah) if (ah, aw) != (h, w) else basis
        cross = cross + jnp.sum(fb * jnp.log(att * weight + _EPS))
    m_cross = cross / sum(weights)
    return (ent - m_cross) / n_pix


def interlayer_divergence(
    attentions: Sequence[jax.Array],
    weights: Optional[Sequence[float]] = None,
    mode: Literal["mean"] = "mean",
    eps: float = _EPS,
    stop_gradient: bool = False,
    divergence: Literal["KLD", "JSD"] = "KLD",
) -> jax.Array:
    """Self-Supervised Deep Supervision / InterlayerDivergence
    (losses.py:90-172).

    attentions: finest-first pyramid of (b,h,w,c) softmax maps.

    KLD 'mean' mode reproduces the paper's *weighted-average log posterior*
    (losses.py:135): m_log_prob = sum_a log(resize(att_a)*w_a + eps) / sum(w),
    then mean over pixels of sum_c basis_c * (log basis_c - m_log_prob_c).
    Note this is NOT KL against the mean posterior — reference quirk kept.

    Quirks preserved: zero-weight layers are skipped from the posterior but
    their weight still counts in sum(weights); an over-long weight list is
    truncated to len(attentions) (losses.py:121-125).
    """
    basis = jax.lax.stop_gradient(attentions[0]) if stop_gradient else attentions[0]
    h, w = basis.shape[1], basis.shape[2]
    rest = list(attentions[1:])
    if weights is None:
        weights = [1 for _ in rest]
    else:
        weights = list(weights)
        if len(weights) != len(rest):
            weights = weights[: len(attentions)]  # reference truncation quirk

    posterior = []
    for att, weight in zip(rest, weights):
        if weight == 0:
            continue
        posterior.append(nearest_resize(att, (h, w)) * weight)

    log_basis = jnp.log(basis + _EPS)

    if divergence == "KLD":
        if mode != "mean":
            raise NotImplementedError("Only 'mean' mode is implemented (as in the reference).")
        stacked = jnp.stack(posterior, axis=0)  # (a,b,h,w,c)
        m_log_prob = jnp.sum(jnp.log(stacked + _EPS), axis=0) / sum(weights)
        div = basis * (log_basis - m_log_prob)
        div = jnp.sum(div, axis=-1)  # sum over classes
        return jnp.mean(div)

    if divergence == "JSD":
        mean_q = jnp.mean(jnp.stack(posterior, axis=0), axis=0)
        mixture = 0.5 * (basis + mean_q)
        log_mixture = jnp.log(mixture + eps)
        log_mean_q = jnp.log(mean_q + _EPS)
        kld_p = jnp.mean(jnp.sum(0.5 * basis * (log_basis - log_mixture), axis=-1))
        kld_q = jnp.mean(jnp.sum(0.5 * mean_q * (log_mean_q - log_mixture), axis=-1))
        return kld_p + kld_q

    raise NotImplementedError(f"Invalid divergence type / Not implemented: {divergence}")


def ce_loss(y_pred: jax.Array, y_true: jax.Array, weight: jax.Array) -> jax.Array:
    """Weighted CE vs argmax(y_true) (losses.py:175-182).

    torch CrossEntropyLoss(weight=w) mean reduction divides by the summed
    weights of the realized targets.
    """
    logits = y_pred.reshape(-1, y_pred.shape[-1])
    targets = jnp.argmax(y_true.reshape(-1, y_true.shape[-1]), axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    wt = weight[targets]
    return jnp.sum(wt * nll) / jnp.sum(wt)


# ---------------------------------------------------------------------------
# Reference-API class wrappers (constructor surface parity)
# ---------------------------------------------------------------------------


class WeightedPartialCE:
    """API-parity wrapper for WeightedPartialCE (losses.py:11-24)."""

    def __init__(self, num_classes: int, eps: float = _EPS, manual: bool = False):
        self.num_classes = num_classes
        self.eps = eps
        self.manual = manual

    def __call__(self, y_hat, ys, ignore_bg: bool = False, reduction="mean", **kwargs):
        return weighted_partial_ce(
            y_hat, ys, self.num_classes, manual=self.manual,
            ignore_bg=ignore_bg, reduction=reduction, full=kwargs.get("full", False),
        )


class DiceLoss:
    def __init__(self, eps: float = _EPS):
        self.eps = eps

    def __call__(self, inputs, targets):
        return dice_loss(inputs, targets, self.eps)


class ImageMseLoss:
    def __call__(self, y_h, y):
        return image_mse_loss(y_h, y)


class InterlayerDivergence:
    """API-parity wrapper (losses.py:90-109); 'sum' mode raises as in the
    reference (losses.py:149-150)."""

    def __init__(self, mode="mean", eps: float = _EPS, upscaling_mode="nn",
                 stop_gradient: bool = False, divergence="KLD"):
        assert mode in ("mean", "sum"), f"mode {mode} is not exists/implemented."
        if mode == "sum":
            raise NotImplementedError("Not implemented yet.")
        self.mode = mode
        self.eps = eps
        self.stop_gradient = stop_gradient
        self.divergence = divergence

    def __call__(self, attentions, weights=None):
        return interlayer_divergence(
            attentions, weights=weights, mode=self.mode, eps=self.eps,
            stop_gradient=self.stop_gradient, divergence=self.divergence,
        )


class CELoss:
    def __init__(self, weight):
        self.weight = jnp.asarray(weight)

    def __call__(self, y_pred, y_true):
        return ce_loss(y_pred, y_true, self.weight)
