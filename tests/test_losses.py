"""Loss-stack parity and golden-value tests.

The reference losses import kornia and loguru, which aren't installed; we
stub both (kornia.resize(nearest) == F.interpolate(mode='nearest'), verified
in test_ops.py) so the true reference code runs for parity. Hand-computed
goldens cover the cases where the math can be checked on paper.
"""
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octave_tpu.losses.gan import ls_discriminator_loss, ls_generator_loss
from octave_tpu.losses.segmentor import (
    ce_loss,
    dice_loss,
    image_mse_loss,
    interlayer_divergence,
    weighted_partial_ce,
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="session")
def ref_losses(torch_reference):
    """Import reference losses with kornia/loguru stubbed."""
    import torch.nn.functional as F

    if "kornia" not in sys.modules:
        kornia = types.ModuleType("kornia")
        geometry = types.ModuleType("kornia.geometry")
        transform = types.ModuleType("kornia.geometry.transform")

        def resize(x, size, interpolation="nearest"):
            assert interpolation == "nearest"
            return F.interpolate(x, size=size, mode="nearest")

        transform.resize = resize
        geometry.transform = transform
        kornia.geometry = geometry
        sys.modules["kornia"] = kornia
        sys.modules["kornia.geometry"] = geometry
        sys.modules["kornia.geometry.transform"] = transform
    if "loguru" not in sys.modules:
        loguru = types.ModuleType("loguru")

        class _L:
            def error(self, *a, **k):
                pass

        loguru.logger = _L()
        sys.modules["loguru"] = loguru

    import architectures.segmentor.losses as ref

    return ref


def _nhwc(x):
    return jnp.asarray(x).transpose(0, 2, 3, 1)


class TestWeightedPartialCE:
    def test_manual_parity(self, ref_losses, rng):
        y_hat = rng.uniform(0.01, 1.0, (2, 3, 8, 8)).astype(np.float32)
        y_hat /= y_hat.sum(axis=1, keepdims=True)
        ys = (rng.uniform(0, 1, (2, 3, 8, 8)) > 0.7).astype(np.float32)

        tm = ref_losses.WeightedPartialCE(num_classes=3, manual=True)
        t = tm(torch.from_numpy(y_hat.copy()), torch.from_numpy(ys.copy())).item()
        j = float(weighted_partial_ce(_nhwc(y_hat), _nhwc(ys), 3, manual=True))
        assert abs(t - j) < 1e-4 * max(1.0, abs(t))

    def test_manual_ignore_bg_full(self, ref_losses, rng):
        y_hat = rng.uniform(0.01, 1.0, (1, 2, 4, 4)).astype(np.float32)
        y_hat /= y_hat.sum(axis=1, keepdims=True)
        ys = (rng.uniform(0, 1, (1, 2, 4, 4)) > 0.5).astype(np.float32)
        tm = ref_losses.WeightedPartialCE(num_classes=2, manual=True)
        for kwargs in ({"ignore_bg": True}, {"full": True}, {"reduction": "sum"}):
            t = tm(torch.from_numpy(y_hat.copy()), torch.from_numpy(ys.copy()), **kwargs).item()
            j = float(weighted_partial_ce(_nhwc(y_hat), _nhwc(ys), 2, manual=True, **kwargs))
            assert abs(t - j) < 1e-4 * max(1.0, abs(t)), kwargs

    def test_golden_handcheck(self):
        """2-class 1x1x1: ys=[0,1], y_hat=[0.3,0.7].
        ni=[0,1], n_tot=1 → w=[1e12, 1] (bg weight explodes — reference
        quirk, but bg term is 0 since ys_0=0 and y_hat masked).
        wce = -(1 * 1 * log(0.7*1 + 1e-12)) = 0.35667."""
        y_hat = jnp.array([[[[0.3, 0.7]]]])
        ys = jnp.array([[[[0.0, 1.0]]]])
        j = float(weighted_partial_ce(y_hat, ys, 2, manual=True))
        assert abs(j - 0.35667494) < 1e-5


class TestDice:
    def test_parity(self, ref_losses, rng):
        x = rng.uniform(0, 1, (3, 2, 6, 6)).astype(np.float32)
        y = (rng.uniform(0, 1, (3, 2, 6, 6)) > 0.5).astype(np.float32)
        t = ref_losses.DiceLoss()(torch.from_numpy(x), torch.from_numpy(y)).item()
        j = float(dice_loss(_nhwc(x), _nhwc(y)))
        assert abs(t - j) < 1e-5

    def test_golden(self):
        """x == y == ones → dice = 1 - 2*N/(2N) = 0."""
        x = jnp.ones((1, 2, 2, 1))
        assert abs(float(dice_loss(x, x))) < 1e-6


class TestImageMse:
    def test_parity(self, ref_losses, rng):
        a = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
        b = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
        t = ref_losses.ImageMseLoss()(torch.from_numpy(a), torch.from_numpy(b)).item()
        j = float(image_mse_loss(jnp.asarray(a), jnp.asarray(b)))
        assert abs(t - j) < 1e-5


class TestInterlayerDivergence:
    def _pyramid(self, rng, scales=(16, 8, 4, 2)):
        atts = []
        for s in scales:
            a = rng.uniform(0.01, 1.0, (2, 3, s, s)).astype(np.float32)
            a /= a.sum(axis=1, keepdims=True)
            atts.append(a)
        return atts

    @pytest.mark.parametrize("divergence", ["KLD", "JSD"])
    def test_parity(self, ref_losses, rng, divergence):
        atts = self._pyramid(rng)
        tm = ref_losses.InterlayerDivergence(divergence=divergence)
        t = tm([torch.from_numpy(a) for a in atts]).item()
        j = float(interlayer_divergence([_nhwc(a) for a in atts], divergence=divergence))
        assert abs(t - j) < 1e-4 * max(1.0, abs(t))

    def test_weighted_and_zero_weight_skip(self, ref_losses, rng):
        atts = self._pyramid(rng)
        weights = [0.5, 0.0, 2.0]
        tm = ref_losses.InterlayerDivergence()
        t = tm([torch.from_numpy(a) for a in atts], weights=list(weights)).item()
        j = float(interlayer_divergence([_nhwc(a) for a in atts], weights=weights))
        assert abs(t - j) < 1e-4 * max(1.0, abs(t))

    def test_stop_gradient(self, rng):
        atts = [_nhwc(a) for a in self._pyramid(rng)]

        def f(a0):
            return interlayer_divergence([a0] + atts[1:], stop_gradient=True)

        g = jax.grad(f)(atts[0])
        assert float(jnp.abs(g).max()) == 0.0

    def test_sum_mode_raises(self):
        from octave_tpu.losses.segmentor import InterlayerDivergence as ILD

        with pytest.raises(NotImplementedError):
            ILD(mode="sum")


class TestCELoss:
    def test_parity(self, ref_losses, rng):
        logits = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
        y_true = np.eye(3, dtype=np.float32)[rng.integers(0, 3, (2, 4, 4))]
        y_true = y_true.transpose(0, 3, 1, 2)
        w = np.array([0.2, 1.0, 2.0], dtype=np.float32)
        tm = ref_losses.CELoss(weight=torch.from_numpy(w))
        t = tm(torch.from_numpy(logits), torch.from_numpy(y_true)).item()
        j = float(ce_loss(_nhwc(logits), _nhwc(y_true), jnp.asarray(w)))
        assert abs(t - j) < 1e-5


class TestLSGAN:
    def test_parity_and_golden(self, torch_reference, rng):
        from architectures.discriminator.losses import (
            LSDiscriminatorialLoss,
            LSGeneratorLoss,
        )

        yr = rng.standard_normal((4, 1)).astype(np.float32)
        yf = rng.standard_normal((4, 1)).astype(np.float32)
        td = LSDiscriminatorialLoss()(torch.from_numpy(yr), torch.from_numpy(yf)).item()
        tg = LSGeneratorLoss()(torch.from_numpy(yf)).item()
        assert abs(td - float(ls_discriminator_loss(jnp.asarray(yr), jnp.asarray(yf)))) < 1e-6
        assert abs(tg - float(ls_generator_loss(jnp.asarray(yf)))) < 1e-6
        # golden: y_real=1, y_fake=-1 → D loss 0; y_fake=1 → G loss 0
        assert float(ls_discriminator_loss(jnp.ones((2, 1)), -jnp.ones((2, 1)))) == 0.0
        assert float(ls_generator_loss(jnp.ones((2, 1)))) == 0.0


class TestPooledILD:
    def test_pooled_equals_resize_impl(self, rng):
        from octave_tpu.losses.segmentor import (
            interlayer_divergence,
            interlayer_divergence_pooled,
        )

        atts = []
        for s in (16, 8, 4, 2, 1):
            a = rng.uniform(0.01, 1.0, (2, s, s, 3)).astype(np.float32)
            a /= a.sum(axis=-1, keepdims=True)
            atts.append(jnp.asarray(a))
        for weights in (None, [0.5, 0.0, 2.0, 1.0]):
            ref = float(interlayer_divergence(atts, weights=weights))
            fast = float(interlayer_divergence_pooled(atts, weights=weights))
            assert abs(ref - fast) < 1e-5 * max(1.0, abs(ref)), (ref, fast)

    def test_pooled_gradients_match(self, rng):
        from octave_tpu.losses.segmentor import (
            interlayer_divergence,
            interlayer_divergence_pooled,
        )

        atts = []
        for s in (8, 4, 2):
            a = rng.uniform(0.01, 1.0, (1, s, s, 2)).astype(np.float32)
            a /= a.sum(axis=-1, keepdims=True)
            atts.append(jnp.asarray(a))
        g_ref = jax.grad(lambda a0: interlayer_divergence([a0] + atts[1:]))(atts[0])
        g_fast = jax.grad(lambda a0: interlayer_divergence_pooled([a0] + atts[1:]))(atts[0])
        np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_fast), atol=1e-5)
