"""Runtime parity for the ROSE propagation / adaptive-aggregation blocks and
the remaining segmentor surfaces (classification heads, encoder gating,
CE-Net BuildResNet, utils helpers)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octave_tpu.models.propagation import (
    AdaptiveAggregationC,
    AdaptiveAggregationMulti,
    AdaptiveAggregationPC,
    BaseC,
    BaseMulti,
    BasePC,
    clip_by_tensor,
    extract_neighborhood,
    global_average_pooling_2d,
)
from octave_tpu.utils.torch_convert import _TreeBuilder, merge_variables


def _sd_numpy(module):
    return {k: v.detach().cpu().numpy().copy() for k, v in module.state_dict().items()}


def _nhwc(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


def _convert_base(tm, prefix=""):
    b = _TreeBuilder(_sd_numpy(tm))
    # raw-parameter convs: convN_kernel (OIHW) + conv7_bias
    for tname, fname in (("conv1", "conv1"), ("conv4", "conv4"), ("conv7", "conv7")):
        b.params[("base", fname, "conv", "kernel")] = np.transpose(
            b.sd[f"{tname}_kernel"], (2, 3, 1, 0)
        )
    b.params[("base", "conv7", "conv", "bias")] = b.sd["conv7_bias"]
    for bn in ("bn1", "bn4", "bn7"):
        b.bn(bn, ("base", bn))
    return b.finish()


class TestPropagationParity:
    def test_base_pc(self, torch_reference, rng):
        torch = torch_reference
        from architectures.segmentor.blocks import basePC as TorchBasePC

        tm = TorchBasePC(channels=8, pn_size=5, kernel_size=3)
        tm.eval()
        src, thick, thin = (
            rng.uniform(0, 1, (2, 1, 12, 12)).astype(np.float32) for _ in range(3)
        )
        with torch.no_grad():
            t = tm(*(torch.from_numpy(a) for a in (src, thick, thin))).numpy()

        jm = BasePC(channels=8, pn_size=5, kernel_size=3)
        args = [jnp.asarray(a).transpose(0, 2, 3, 1) for a in (src, thick, thin)]
        variables = merge_variables(
            jm.init(jax.random.PRNGKey(0), *args, False), _convert_base(tm)
        )
        j = jm.apply(variables, *args, False)
        np.testing.assert_allclose(t, _nhwc(j), atol=1e-5)

    def test_base_c_and_multi(self, torch_reference, rng):
        torch = torch_reference
        from architectures.segmentor.blocks import baseC as TorchBaseC
        from architectures.segmentor.blocks import baseMulti as TorchBaseMulti

        src, thin, extra = (
            rng.uniform(0, 1, (1, 1, 10, 10)).astype(np.float32) for _ in range(3)
        )
        tm = TorchBaseC(channels=8, pn_size=3)
        tm.eval()
        with torch.no_grad():
            t = tm(torch.from_numpy(src), torch.from_numpy(thin)).numpy()
        jm = BaseC(channels=8, pn_size=3)
        args = [jnp.asarray(a).transpose(0, 2, 3, 1) for a in (src, thin)]
        variables = merge_variables(
            jm.init(jax.random.PRNGKey(0), *args, False), _convert_base(tm)
        )
        np.testing.assert_allclose(t, _nhwc(jm.apply(variables, *args, False)), atol=1e-5)

        tmm = TorchBaseMulti(in_channels=3, channels=8, pn_size=3)
        tmm.eval()
        with torch.no_grad():
            t = tmm([torch.from_numpy(a) for a in (src, thin, extra)]).numpy()
        jmm = BaseMulti(in_channels=3, channels=8, pn_size=3)
        argsm = [jnp.asarray(a).transpose(0, 2, 3, 1) for a in (src, thin, extra)]
        variables = merge_variables(
            jmm.init(jax.random.PRNGKey(0), argsm, False), _convert_base(tmm)
        )
        np.testing.assert_allclose(t, _nhwc(jmm.apply(variables, argsm, False)), atol=1e-5)

    def test_adaptive_aggregation_all(self, torch_reference, rng):
        torch = torch_reference
        from architectures.segmentor.blocks import (
            adaptive_aggregationC,
            adaptive_aggregationMulti,
            adaptive_aggregationPC,
        )

        k = 5
        thick, thin = (rng.uniform(0, 1, (2, 1, 9, 9)).astype(np.float32) for _ in range(2))
        coeff = rng.uniform(0, 1, (2, k * k, 9, 9)).astype(np.float32)
        coeff /= coeff.sum(1, keepdims=True)

        with torch.no_grad():
            t_pc = adaptive_aggregationPC(k)(
                torch.from_numpy(thick), torch.from_numpy(thin), torch.from_numpy(coeff)
            ).numpy()
            t_c = adaptive_aggregationC(k)(
                torch.from_numpy(thin), torch.from_numpy(coeff)
            ).numpy()
            t_m = adaptive_aggregationMulti(k)(
                torch.from_numpy(thick), torch.from_numpy(coeff)
            ).numpy()

        thick_j, thin_j, coeff_j = (
            jnp.asarray(a).transpose(0, 2, 3, 1) for a in (thick, thin, coeff)
        )
        j_pc = AdaptiveAggregationPC(k)(thick_j, thin_j, coeff_j)
        j_c = AdaptiveAggregationC(k)(thin_j, coeff_j)
        j_m = AdaptiveAggregationMulti(k)(thick_j, coeff_j)
        np.testing.assert_allclose(t_pc, _nhwc(j_pc), atol=1e-5)
        np.testing.assert_allclose(t_c, _nhwc(j_c), atol=1e-5)
        np.testing.assert_allclose(t_m, _nhwc(j_m), atol=1e-5)

    def test_mapping_kernel_equivalence(self, torch_reference, rng):
        """extract_neighborhood == F.conv2d with the one-hot mapping kernel
        (blocks.py:66-83) including channel ordering."""
        torch = torch_reference
        from architectures.segmentor.blocks import create_mapping_kernel

        x = rng.uniform(0, 1, (2, 1, 8, 8)).astype(np.float32)
        for k in (3, 5, 7):
            w = create_mapping_kernel(k)
            with torch.no_grad():
                t = torch.nn.functional.conv2d(
                    torch.from_numpy(x), w, padding=k // 2
                ).numpy()
            j = extract_neighborhood(jnp.asarray(x).transpose(0, 2, 3, 1), k)
            np.testing.assert_allclose(t, _nhwc(j), atol=0)

    def test_clip_and_gap(self, torch_reference, rng):
        from architectures.segmentor.blocks import GlobalAveragePooling2D, clip_by_tensor as tc

        torch = torch_reference
        x = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
        np.testing.assert_allclose(
            tc(torch.from_numpy(x), -0.5, 0.5).numpy(),
            np.asarray(clip_by_tensor(jnp.asarray(x), -0.5, 0.5)),
            atol=0,
        )
        np.testing.assert_allclose(
            GlobalAveragePooling2D()(torch.from_numpy(x)).numpy(),
            np.asarray(global_average_pooling_2d(jnp.asarray(x).transpose(0, 2, 3, 1))),
            atol=1e-6,
        )


class TestUtilsParity:
    def test_same_padding(self, torch_reference):
        import sys

        sys.path.insert(0, "/root/reference")
        from architectures.utils import get_same_padding_conv as ref_conv
        from architectures.utils import get_same_padding_transpose as ref_tr

        from octave_tpu.utils.padding import (
            get_same_padding_conv,
            get_same_padding_transpose,
        )

        for n in (19, 38, 304, 400):
            for k in (1, 2, 3, 4, 7):
                for s in (1, 2):
                    assert get_same_padding_conv(n, k, s) == ref_conv(n, k, s)
                    assert get_same_padding_transpose(n, k, s) == ref_tr(n, k, s)


@pytest.mark.slow
class TestClassificationAndGating:
    def test_classification_predict_parity(self, torch_reference, rng):
        torch = torch_reference
        from architectures.segmentor.compose import ResnestUNet as TorchUNet

        from octave_tpu.models.segmentor import ResnestUNet
        from octave_tpu.utils.torch_convert import convert_resnest_unet

        tm = TorchUNet(num_classes=2, pretrain=False)
        tm.eval()
        x = rng.standard_normal((1, 3, 64, 64), dtype=np.float32)
        variables = convert_resnest_unet(_sd_numpy(tm))
        jm = ResnestUNet(num_classes=2)
        xj = jnp.asarray(x).transpose(0, 2, 3, 1)
        init_vars = jm.init(
            jax.random.PRNGKey(0), xj, "softmax", "ae-extract", False,
            method=ResnestUNet.classification_predict,
        )
        variables = merge_variables(init_vars, variables)

        for mode in ("classic", "ae-squash", "ae-extract"):
            with torch.no_grad():
                t_pred, _, t_seg = tm.classification_predict(
                    torch.from_numpy(x), "softmax", mode
                )
            j_pred, _, j_seg = jm.apply(
                variables, xj, "softmax", mode, False,
                method=ResnestUNet.classification_predict,
            )
            np.testing.assert_allclose(
                t_pred.numpy(), np.asarray(j_pred), atol=5e-4, err_msg=mode
            )
            np.testing.assert_allclose(
                t_seg.numpy(), _nhwc(j_seg), atol=5e-4, err_msg=mode
            )

    def test_encoder_gating_parity(self, torch_reference, rng):
        torch = torch_reference
        from architectures.segmentor.compose import ResnestUNet as TorchUNet

        from octave_tpu.models.segmentor import ResnestUNet
        from octave_tpu.utils.torch_convert import convert_resnest_unet

        tm = TorchUNet(num_classes=2, pretrain=False, encoder_gating=True)
        tm.eval()
        x = rng.standard_normal((1, 3, 64, 64), dtype=np.float32)
        with torch.no_grad():
            t_gx, t_atts, t_agg, t_x4 = tm(torch.from_numpy(x))

        variables = convert_resnest_unet(_sd_numpy(tm), encoder_gating=True)
        jm = ResnestUNet(num_classes=2, encoder_gating=True)
        xj = jnp.asarray(x).transpose(0, 2, 3, 1)
        variables = merge_variables(jm.init(jax.random.PRNGKey(0), xj, False), variables)
        j_gx, j_atts, j_agg, _ = jm.apply(variables, xj, False)
        assert len(t_gx) == len(j_gx) == 5
        for i, (tg, jg) in enumerate(zip(t_gx, j_gx)):
            np.testing.assert_allclose(tg.numpy(), _nhwc(jg), atol=5e-4, err_msg=f"gate {i}")
        np.testing.assert_allclose(t_agg.numpy(), _nhwc(j_agg), atol=5e-4)
