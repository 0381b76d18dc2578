"""OctaScribbleNet facade: constructor surface parity, combined forward,
loss bundle switching (reference octa.py:14-60)."""
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octave_tpu.models.octa import OctaScribbleNet, _shape_chw, octa_scribble_net


@pytest.mark.smoke
def test_shape_inference():
    assert _shape_chw((1, 2, 304, 304)) == (2, 304, 304)  # NCHW
    assert _shape_chw((1, 304, 304, 2)) == (2, 304, 304)  # NHWC


@pytest.mark.smoke
def test_factory_arg_surface():
    """The reference constructor argument list incl. the `pretrian` typo
    (octa.py:16-29) is accepted."""
    model, wp = octa_scribble_net(
        raw_input_shape=(1, 1, 64, 64), mask_input_shape=(1, 2, 64, 64),
        is_training=True, pretrian=True, weight_path="w.pth", num_classes=2,
        num_filters=8, instance_noise=False, label_noise=False,
        segmentor_gating_level=4, discriminator_depth=2, encoder_gating=False,
        weakly_supervise=True,
    )
    assert wp == "w.pth"  # pretrian=True → weight path returned for loading
    assert model.num_filters == 8
    _, wp2 = octa_scribble_net((1, 1, 64, 64), (1, 2, 64, 64), True)
    assert wp2 is None


def test_channel_mismatch_warns():
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        m = OctaScribbleNet(
            raw_input_shape=(1, 1, 32, 32), mask_input_shape=(1, 3, 32, 32),
            num_classes=2, discriminator_depth=0,
        )
        # abstract init: the warning fires during setup/trace; a real init
        # at 32 costs ~25 s of CPU compute this test doesn't need
        m.lazy_init({"params": jax.random.PRNGKey(0)},
                    jax.ShapeDtypeStruct((1, 32, 32, 1), jnp.float32),
                    None, train=False)
    assert any("Number channels" in str(x.message) for x in w)


def test_loss_bundle_switch():
    weak = OctaScribbleNet((1, 1, 32, 32), (1, 2, 32, 32), num_classes=2,
                           weakly_supervise=True)
    full = OctaScribbleNet((1, 1, 32, 32), (1, 2, 32, 32), num_classes=2,
                           weakly_supervise=False)
    probs = jax.nn.softmax(jnp.ones((1, 8, 8, 2)), -1)
    ys = jax.nn.one_hot(jnp.zeros((1, 8, 8), jnp.int32), 2)
    lw = float(weak.supervised_loss(probs, ys))
    lf = float(full.supervised_loss(probs, ys))
    # WPCE of uniform probs = -w0*log(0.5); Dice of 0.5-vs-onehot differs
    assert lw != pytest.approx(lf)
    assert np.isfinite(lw) and np.isfinite(lf)
    # LSGAN bundle (octa.py:55-56)
    y = jnp.ones((2, 1))
    assert float(OctaScribbleNet.discriminatorial_loss(y, -y)) == 0.0
    assert float(OctaScribbleNet.generator_loss(y)) == 0.0


@pytest.mark.slow
def test_combined_forward_with_discriminator(rng):
    hw = 32
    model = OctaScribbleNet(
        raw_input_shape=(1, 3, hw, hw), mask_input_shape=(1, 2, hw, hw),
        is_training=True, num_classes=2, num_filters=8, discriminator_depth=4,
    )
    x = jnp.asarray(rng.uniform(0, 1, (1, hw, hw, 3)), jnp.float32)
    mask = (rng.uniform(0, 1, (1, hw, hw, 2)) > 0.5).astype(np.float32)
    pyr = [jnp.asarray(mask[:, ::2**i, ::2**i, :]) for i in range(5)]
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        x, pyr, train=True,
    )
    out, mut = model.apply(
        variables, x, pyr, train=True, rngs={"noise": jax.random.PRNGKey(2)},
        mutable=["batch_stats", "spectral"],
    )
    assert len(out["attentions"]) == 5
    assert out["agg_map"].shape == (1, hw, hw, 2)
    assert out["y_fake"].shape == out["y_real"].shape == (1, 1)
    assert "spectral" in mut and "batch_stats" in mut
