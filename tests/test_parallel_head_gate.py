"""ResnestUnetParallelHeadAttentionGate: structure and gating-level
semantics (compose.py:365-527) — shapes, strict >3 depth-4 gate, dual
attention pyramids, predict methods."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octave_tpu.models.segmentor import ResnestUnetParallelHeadAttentionGate

HW = 32


@pytest.fixture(scope="module")
def built(rng_mod=np.random.default_rng(3)):
    m = ResnestUnetParallelHeadAttentionGate(num_classes=2, gating_level=3)
    x = jnp.asarray(rng_mod.uniform(0, 1, (1, HW, HW, 3)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, False)
    return m, v, x


@pytest.mark.slow
class TestParallelHeadGate:
    def test_forward_structure(self, built):
        m, v, x = built
        (atts, atts_c), agg = m.apply(v, x, False)
        # gating_level=3 default: strict >3 drops the depth-4 gate → 4 gates
        assert len(atts) == 4
        assert len(atts_c) == 2
        assert agg.shape == (2, 1, HW, HW, 2)
        # finest-first
        assert atts[0].shape[1] == HW
        assert atts[0].shape[1] > atts[-1].shape[1]
        assert atts_c[0].shape[1] == HW

    def test_gate_level_4_adds_depth4(self):
        m = ResnestUnetParallelHeadAttentionGate(num_classes=2, gating_level=4)
        x = jnp.zeros((1, HW, HW, 3))
        v = m.init(jax.random.PRNGKey(0), x, False)
        (atts, atts_c), _ = m.apply(v, x, False)
        assert len(atts) == 5

    def test_predict_softmax(self, built):
        m, v, x = built
        atts, pred = m.apply(v, x, "softmax", False,
                             method=ResnestUnetParallelHeadAttentionGate.predict)
        assert pred.shape == (2, 1, HW, HW, 2)
        np.testing.assert_allclose(np.asarray(pred.sum(-1)), 1.0, atol=1e-5)
