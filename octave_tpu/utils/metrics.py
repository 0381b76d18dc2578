"""Segmentation metrics: Dice / IoU / accuracy via jitted confusion
accumulation, AUC via a device-side binned ROC (no per-batch host round
trips — SURVEY.md §7 hard part (f)).

The reference computes metrics off-tree (sklearn pinned but unused in-tree,
reference requirements.txt:12); these are the in-framework equivalents used
by the eval harness for the BASELINE.json configs #2-3.
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ConfusionAccumulator(NamedTuple):
    """Streaming confusion counts for a binary (vessel) class.

    Counts are EXACT integers end-to-end (VERDICT r2 item 5): int32 on
    device (exact per-batch/per-psum up to 2^31 — a 256x400² batch is 4e7
    pixels), and the eval harness accumulates batches host-side in int64
    (`astype64`), so dataset-scale counts never round (float32 integer
    exactness stops at 2^24 ≈ 16.7M — an OCTA-500-scale test set exceeds it).
    """

    tp: jax.Array
    fp: jax.Array
    fn: jax.Array
    tn: jax.Array

    @classmethod
    def empty(cls) -> "ConfusionAccumulator":
        z = jnp.zeros((), jnp.int32)
        return cls(z, z, z, z)

    @classmethod
    def empty_host(cls) -> "ConfusionAccumulator":
        """int64 numpy accumulator for host-side dataset aggregation."""
        z = np.int64(0)
        return cls(z, z, z, z)

    def astype64(self) -> "ConfusionAccumulator":
        """Device counts → host int64 (for exact cross-batch accumulation)."""
        return ConfusionAccumulator(
            *(np.asarray(x).astype(np.int64) for x in self)
        )

    def update(
        self, pred: jax.Array, target: jax.Array, weight: jax.Array = None
    ) -> "ConfusionAccumulator":
        """pred/target (b, ...) binary maps; optional per-sample weight (b,)
        with values in {0, 1} — a 0 weight drops the sample entirely (used
        for mesh tail-batch padding, where shards must stay equal-sized).
        Fractional weights are not supported (counts are exact integers)."""
        pred = pred.astype(jnp.int32)
        target = target.astype(jnp.int32)
        if weight is not None:
            w = jnp.round(weight).astype(jnp.int32).reshape(
                (pred.shape[0],) + (1,) * (pred.ndim - 1)
            )
            return ConfusionAccumulator(
                self.tp + jnp.sum(w * pred * target),
                self.fp + jnp.sum(w * pred * (1 - target)),
                self.fn + jnp.sum(w * (1 - pred) * target),
                self.tn + jnp.sum(w * (1 - pred) * (1 - target)),
            )
        return ConfusionAccumulator(
            self.tp + jnp.sum(pred * target),
            self.fp + jnp.sum(pred * (1 - target)),
            self.fn + jnp.sum((1 - pred) * target),
            self.tn + jnp.sum((1 - pred) * (1 - target)),
        )

    def dice(self, eps: float = 1e-12) -> jax.Array:
        return 2 * self.tp / (2 * self.tp + self.fp + self.fn + eps)

    def iou(self, eps: float = 1e-12) -> jax.Array:
        return self.tp / (self.tp + self.fp + self.fn + eps)

    def accuracy(self, eps: float = 1e-12) -> jax.Array:
        total = self.tp + self.fp + self.fn + self.tn
        return (self.tp + self.tn) / (total + eps)

    def sensitivity(self, eps: float = 1e-12) -> jax.Array:
        return self.tp / (self.tp + self.fn + eps)

    def specificity(self, eps: float = 1e-12) -> jax.Array:
        return self.tn / (self.tn + self.fp + eps)


def dice_score(pred: jax.Array, target: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Hard Dice over the whole batch (binary maps)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    inter = jnp.sum(pred * target)
    return 2 * inter / (jnp.sum(pred) + jnp.sum(target) + eps)


class AucAccumulator(NamedTuple):
    """Binned-ROC AUC: histogram positive/negative scores into fixed bins on
    device; the final AUC is a trapezoid over the binned ROC. With 4096 bins
    the quantization error is ≪ 1e-3 for ≤400² maps.

    Bin counts are exact int32 on device / int64 host-side (`astype64`) —
    same rationale as ConfusionAccumulator: a dataset's background pixels
    alone exceed float32's 2^24 integer range."""

    pos_hist: jax.Array  # (bins,)
    neg_hist: jax.Array

    @classmethod
    def empty(cls, bins: int = 4096) -> "AucAccumulator":
        return cls(jnp.zeros((bins,), jnp.int32), jnp.zeros((bins,), jnp.int32))

    @classmethod
    def empty_host(cls, bins: int = 4096) -> "AucAccumulator":
        return cls(np.zeros((bins,), np.int64), np.zeros((bins,), np.int64))

    def astype64(self) -> "AucAccumulator":
        return AucAccumulator(*(np.asarray(x).astype(np.int64) for x in self))

    def update(
        self, scores: jax.Array, target: jax.Array, weight: jax.Array = None
    ) -> "AucAccumulator":
        bins = self.pos_hist.shape[0]
        s = jnp.clip(scores.reshape(-1), 0.0, 1.0)
        t = target.reshape(-1).astype(jnp.int32)
        if weight is None:
            w = jnp.ones_like(t)
        else:
            wb = jnp.round(weight).astype(jnp.int32).reshape(
                (scores.shape[0],) + (1,) * (scores.ndim - 1)
            )
            w = jnp.broadcast_to(wb, scores.shape).reshape(-1)
        idx = jnp.clip((s * bins).astype(jnp.int32), 0, bins - 1)
        pos = jnp.zeros((bins,), jnp.int32).at[idx].add(w * t)
        neg = jnp.zeros((bins,), jnp.int32).at[idx].add(w * (1 - t))
        return AucAccumulator(self.pos_hist + pos, self.neg_hist + neg)

    def auc(self, eps: float = 1e-12):
        """Equivalent to the rank statistic on binned scores with tie
        correction (each bin contributes tp-trapezoid area). Works on both
        device (jax int32) and host (numpy int64) accumulators — numpy
        arrays stay in numpy (jnp would silently downcast int64 → int32)."""
        xp = np if isinstance(self.pos_hist, np.ndarray) else jnp
        ftype = np.float64 if xp is np else jnp.float32
        # descending-threshold cumulative counts, EXACT in the int dtype
        # (float cumsum would round above 2^24); ratios in float after
        cpos = xp.cumsum(self.pos_hist[::-1]).astype(ftype)
        cneg = xp.cumsum(self.neg_hist[::-1]).astype(ftype)
        p_tot = cpos[-1]
        n_tot = cneg[-1]
        tpr = cpos / (p_tot + eps)
        fpr = cneg / (n_tot + eps)
        tpr = xp.concatenate([xp.zeros((1,), ftype), tpr])
        fpr = xp.concatenate([xp.zeros((1,), ftype), fpr])
        return xp.sum((fpr[1:] - fpr[:-1]) * 0.5 * (tpr[1:] + tpr[:-1]))


def auc_exact(scores, target) -> float:
    """Host-side exact AUC (Mann-Whitney U with tie correction) for
    validation of the binned accumulator."""
    import numpy as np

    s = np.asarray(scores).reshape(-1)
    t = np.asarray(target).reshape(-1).astype(bool)
    n_pos = int(t.sum())
    n_neg = t.size - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(s, kind="mergesort")
    ranks = np.empty_like(order, dtype=np.float64)
    sorted_s = s[order]
    # average ranks for ties
    i = 0
    r = np.arange(1, s.size + 1, dtype=np.float64)
    while i < s.size:
        j = i
        while j + 1 < s.size and sorted_s[j + 1] == sorted_s[i]:
            j += 1
        r[i : j + 1] = 0.5 * (i + 1 + j + 1)
        i = j + 1
    ranks[order] = r
    u = ranks[t].sum() - n_pos * (n_pos + 1) / 2
    return float(u / (n_pos * n_neg))


def cl_dice(pred: "np.ndarray", target: "np.ndarray") -> float:
    """centerline-Dice (topology-aware vessel metric): harmonic mean of
    topology precision/sensitivity computed on morphological skeletons.
    Host-side (rank/skeleton ops don't jit); used by the eval harness next to
    Dice/AUC for the vessel benchmarks."""
    import numpy as np
    from scipy.ndimage import binary_erosion, binary_opening

    def skel(m):
        m = m.astype(bool)
        out = np.zeros_like(m)
        er = m
        while er.any():
            out |= er & ~binary_opening(er)
            er = binary_erosion(er)
        return out

    p = np.asarray(pred).astype(bool)
    t = np.asarray(target).astype(bool)
    sp, st = skel(p), skel(t)
    eps = 1e-12
    tprec = (sp & t).sum() / (sp.sum() + eps)
    tsens = (st & p).sum() / (st.sum() + eps)
    return float(2 * tprec * tsens / (tprec + tsens + eps))


@jax.jit
def eval_step_metrics(
    probs: jax.Array, target: jax.Array, threshold: float = 0.5
) -> Dict[str, jax.Array]:
    """One-shot metrics for a batch: probs (b,h,w) vessel probability,
    target (b,h,w) binary GT."""
    pred = (probs >= threshold).astype(jnp.float32)
    acc = ConfusionAccumulator.empty().update(pred, target)
    auc = AucAccumulator.empty().update(probs, target)
    return {
        "dice": acc.dice(),
        "iou": acc.iou(),
        "accuracy": acc.accuracy(),
        "sensitivity": acc.sensitivity(),
        "specificity": acc.specificity(),
        "auc": auc.auc(),
    }
