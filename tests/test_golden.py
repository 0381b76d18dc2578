"""Golden-fixture parity WITHOUT torch (VERDICT r3 item 5).

tests/golden/*.npz hold the torch reference's fp32 outputs at fixed seeds
(generated once by tests/golden/generate.py on a host with torch + the
reference tree). These tests rebuild the same weights from the committed
state-dict manifest via the deterministic fill protocol (tests/goldens.py),
convert them through the production converter (pure numpy), and check this
package's outputs — so the parity claim stays verifiable on any host, torch
installed or not.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from goldens import disc_pyramid, fill_state_dict, input_array, load_fixture
from octave_tpu.utils.torch_convert import (
    convert_discriminator,
    convert_resnest_unet,
    merge_variables,
)


def _nchw(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


def _max_err(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


def _run_unet(name, tol):
    from octave_tpu.models.segmentor import ResnestUNet

    manifest, meta, out = load_fixture(name)
    sd = fill_state_dict(manifest)
    variables = convert_resnest_unet(sd)
    hw = meta["hw"]
    x = input_array(meta["seed"], (1, 3, hw, hw))
    xj = jnp.asarray(x).transpose(0, 2, 3, 1)
    jm = ResnestUNet(num_classes=2, gating_level=meta["gating_level"])
    variables = merge_variables(jm.init(jax.random.PRNGKey(0), xj, False),
                                variables)
    j_atts, j_pred = jm.apply(variables, xj, "softmax", False,
                              method=ResnestUNet.predict)
    for i, ja in enumerate(j_atts):
        assert _max_err(out[f"att{i}"], _nchw(ja)) < tol, f"attention {i}"
    assert _max_err(out["pred"], _nchw(j_pred)) < tol, "pred"
    if "x4" in out:
        j_atts_f, j_agg, j_x4 = jm.apply(variables, xj, False)
        assert _max_err(out["agg"], _nchw(j_agg)) < tol, "agg"
        assert _max_err(out["x4"], _nchw(j_x4)) < tol, "x4"


def test_golden_unet112():
    _run_unet("unet112", tol=1e-3)


@pytest.mark.slow
def test_golden_unet304():
    _run_unet("unet304", tol=1e-3)


@pytest.mark.slow
def test_golden_unet400():
    _run_unet("unet400", tol=1e-3)


@pytest.mark.slow
def test_golden_parallel_head_gate112():
    from octave_tpu.models.segmentor import ResnestUnetParallelHeadAttentionGate

    manifest, meta, out = load_fixture("phg112")
    sd = fill_state_dict(manifest)
    variables = convert_resnest_unet(sd, parallel_gates=True)
    hw = meta["hw"]
    x = input_array(meta["seed"], (1, 3, hw, hw))
    xj = jnp.asarray(x).transpose(0, 2, 3, 1)
    jm = ResnestUnetParallelHeadAttentionGate(num_classes=2,
                                              gating_level=meta["gating_level"])
    variables = merge_variables(jm.init(jax.random.PRNGKey(0), xj, False),
                                variables)
    (j_atts, j_atts_c), j_agg = jm.apply(variables, xj, False)
    assert len(j_atts) == meta["n_atts"] and len(j_atts_c) == meta["n_atts_c"]
    for i, ja in enumerate(j_atts):
        assert _max_err(out[f"att{i}"], _nchw(ja)) < 1e-3, f"att {i}"
    for i, ja in enumerate(j_atts_c):
        assert _max_err(out[f"attc{i}"], _nchw(ja)) < 1e-3, f"attc {i}"
    j_agg_nchw = np.asarray(j_agg).transpose(0, 1, 4, 2, 3)
    assert _max_err(out["agg"], j_agg_nchw) < 1e-3, "agg"


def test_golden_parallel_head112():
    """Plain dual-decoder variant (reference compose.py:233-362), quick-tier
    and torch-free — closes the coverage hole that let the round-4
    construction regression ship (VERDICT r4 item 5)."""
    from octave_tpu.models.segmentor import ResnestUnetParallelHead

    manifest, meta, out = load_fixture("ph112")
    sd = fill_state_dict(manifest)
    variables = convert_resnest_unet(sd, parallel_head=True)
    hw = meta["hw"]
    x = input_array(meta["seed"], (1, 3, hw, hw))
    xj = jnp.asarray(x).transpose(0, 2, 3, 1)
    jm = ResnestUnetParallelHead(num_classes=2)
    variables = merge_variables(jm.init(jax.random.PRNGKey(0), xj, False),
                                variables)
    j_agg = jm.apply(variables, xj, False)            # (2, B, H, W, C)
    j_pred = jm.apply(variables, xj, "softmax", False,
                      method=ResnestUnetParallelHead.predict)
    for got, want, label in ((j_agg, out["agg"], "agg"),
                             (j_pred, out["pred"], "pred")):
        got_nchw = np.asarray(got).transpose(0, 1, 4, 2, 3)
        assert want.shape == got_nchw.shape, label
        assert _max_err(want, got_nchw) < 1e-3, label


def test_golden_discriminator64():
    from octave_tpu.models.discriminator import DiscriminatorBlock

    manifest, meta, out = load_fixture("disc64")
    sd = fill_state_dict(manifest)
    variables = convert_discriminator(sd, depth=meta["depth"],
                                      instance_noise=True)
    ys = disc_pyramid(meta["seed"], 2, 2, meta["h"], meta["w"], meta["depth"])
    ysj = [jnp.asarray(y).transpose(0, 2, 3, 1) for y in ys]
    jm = DiscriminatorBlock(input_hw=(meta["h"], meta["w"]),
                            depth=meta["depth"],
                            num_filters=meta["num_filters"],
                            instance_noise=True, label_noise=False)
    init_vars = jm.init({"params": jax.random.PRNGKey(0)}, ysj, False)
    variables = merge_variables(init_vars, variables)
    j_logits = np.asarray(jm.apply(variables, ysj, False))
    assert out["logits"].shape == j_logits.shape
    assert _max_err(out["logits"], j_logits) < 5e-4


def test_golden_losses():
    from goldens import loss_inputs
    from octave_tpu.losses.gan import ls_discriminator_loss, ls_generator_loss
    from octave_tpu.losses.segmentor import (
        ce_loss,
        dice_loss,
        image_mse_loss,
        interlayer_divergence,
        weighted_partial_ce,
    )

    _, _, ref = load_fixture("losses")
    t = loss_inputs()

    def nhwc(x):
        return jnp.asarray(x).transpose(0, 2, 3, 1)

    atts = [nhwc(t[f"att{s}"]) for s in (16, 8, 4, 2)]
    got = {
        "wpce_manual": weighted_partial_ce(nhwc(t["wpce_yhat"]),
                                           nhwc(t["wpce_ys"]), 3, manual=True),
        "wpce_ignore_bg": weighted_partial_ce(
            nhwc(t["wpce2_yhat"]), nhwc(t["wpce2_ys"]), 2, manual=True,
            ignore_bg=True),
        "wpce_full": weighted_partial_ce(
            nhwc(t["wpce2_yhat"]), nhwc(t["wpce2_ys"]), 2, manual=True,
            full=True),
        "wpce_sum": weighted_partial_ce(
            nhwc(t["wpce2_yhat"]), nhwc(t["wpce2_ys"]), 2, manual=True,
            reduction="sum"),
        "dice": dice_loss(nhwc(t["dice_x"]), nhwc(t["dice_y"])),
        "image_mse": image_mse_loss(jnp.asarray(t["mse_a"]),
                                    jnp.asarray(t["mse_b"])),
        "ild_kld": interlayer_divergence(atts, divergence="KLD"),
        "ild_jsd": interlayer_divergence(atts, divergence="JSD"),
        "ild_weighted": interlayer_divergence(atts, weights=[0.5, 0.0, 2.0]),
        "ce_weighted": ce_loss(nhwc(t["ce_logits"]), nhwc(t["ce_ytrue"]),
                               jnp.asarray(t["ce_w"])),
        "lsgan_d": ls_discriminator_loss(jnp.asarray(t["gan_r"]),
                                         jnp.asarray(t["gan_f"])),
        "lsgan_g": ls_generator_loss(jnp.asarray(t["gan_f"])),
    }
    for k, v in got.items():
        r = float(ref[k])
        assert abs(float(v) - r) < 1e-4 * max(1.0, abs(r)), (k, float(v), r)
