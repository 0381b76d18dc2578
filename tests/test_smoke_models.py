"""Quick-tier smoke: every public model class constructs and its forward
traces, with zero FLOPs (abstract init + eval_shape).

This exists because round 4 shipped a regression where two of the three
segmentors (compose.py:233-527) raised AttributeError at setup() while the
quick tier stayed green — every test touching them was slow-marked. These
checks run in seconds and fail if any public class can't build or trace.
"""
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.smoke

from octave_tpu.models import (
    AdversarialAttentionGate,
    DiscriminatorBlock,
    OctaScribbleNet,
    ResnestUNet,
    ResnestUnetParallelHead,
    ResnestUnetParallelHeadAttentionGate,
    resnest50,
)

HW = 32
KEY = jax.random.PRNGKey(0)


def _trace(m, arrays, *static, rngs=None):
    """Abstract init + abstract apply: runs every setup()/__call__ line
    (so missing fields / shape bugs raise) without any real compute.

    `arrays` (tuple of ShapeDtypeStructs / lists thereof) are traced;
    `static` args (train flags etc.) stay Python values.
    """
    variables = m.lazy_init(rngs or KEY, *arrays, *static)
    mutable = [c for c in variables if c != "params"]
    return jax.eval_shape(
        lambda v, a: m.apply(v, *a, *static, rngs=rngs, mutable=mutable),
        variables, tuple(arrays))


X = jax.ShapeDtypeStruct((1, HW, HW, 3), jnp.float32)

SEGMENTORS = [
    ResnestUNet(num_classes=2),
    ResnestUNet(num_classes=2, encoder_gating=True, gating_level=3),
    ResnestUnetParallelHead(num_classes=2),
    ResnestUnetParallelHeadAttentionGate(num_classes=2),
    ResnestUnetParallelHeadAttentionGate(num_classes=2, gating_level=4),
]


@pytest.mark.parametrize("m", SEGMENTORS, ids=lambda m: type(m).__name__
                         + f"_gl{getattr(m, 'gating_level', '-')}"
                         + ("_encgate" if getattr(m, "encoder_gating", False) else ""))
def test_segmentor_traces(m):
    # train=True traces every setup() line plus the BN-update branch; the
    # eval-path branch is covered once on the base class below (tracing a
    # full resnest50 twice per variant costs ~1 min/case on a 1-CPU host)
    _trace(m, (X,), True)


def test_base_segmentor_eval_path_traces():
    _trace(SEGMENTORS[0], (X,), False)


def test_segmentor_trainer_kwargs_accepted():
    """Trainer passes these to every segmentor class (trainer.py); a class
    that doesn't declare one of them breaks the whole train surface."""
    for cls in (ResnestUNet, ResnestUnetParallelHead,
                ResnestUnetParallelHeadAttentionGate):
        m = cls(num_classes=2, bn_axis_name=None, remat_blocks=False,
                remat_save_convs=False, remat_enc_layers=True)
        _trace(m, (X,), False)


def test_backbone_traces():
    _trace(resnest50(), (X,), False)


def test_discriminator_traces():
    m = DiscriminatorBlock(input_hw=(HW, HW), depth=2, num_filters=8)
    pyr = [jax.ShapeDtypeStruct((1, HW // 2 ** i, HW // 2 ** i, 2), jnp.float32)
           for i in range(3)]
    _trace(m, (pyr,), False, rngs={"params": KEY, "noise": KEY})


def test_aag_traces():
    m = AdversarialAttentionGate(8, 2)
    f = jax.ShapeDtypeStruct((1, HW, HW, 8), jnp.float32)
    _trace(m, (f,))


def test_facade_traces():
    m = OctaScribbleNet(raw_input_shape=(1, 3, HW, HW),
                        mask_input_shape=(1, 2, HW, HW),
                        num_classes=2, discriminator_depth=2, num_filters=8)
    pyr = [jax.ShapeDtypeStruct((1, HW // 2 ** i, HW // 2 ** i, 2), jnp.float32)
           for i in range(3)]
    out, _ = _trace(m, (X, pyr), False, rngs={"params": KEY, "noise": KEY})
    assert {"attentions", "agg_map", "latent", "y_fake", "y_real"} <= set(out)
