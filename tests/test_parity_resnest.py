"""Runtime numerical parity vs the PyTorch reference (model forward paths).

Strategy (SURVEY.md §4): build the torch module with random init, convert its
state_dict through octave_tpu.utils.torch_convert, and compare eval-mode
forwards on a fixed input. Tolerance 2e-4 fp32 relative to unit-scale
activations.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octave_tpu.models.resnest import ResNeSt, ResNestDecoder, SplAtConv2d, Upsampling, resnest50
from octave_tpu.utils.torch_convert import (
    _TreeBuilder,
    convert_resnest50,
    merge_variables,
)


def _sd_numpy(module):
    return {k: v.detach().cpu().numpy().copy() for k, v in module.state_dict().items()}


def _max_err(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


class TestSplAtConv2d:
    def test_parity(self, torch_reference, rng):
        torch = torch_reference
        from architectures.extra.resnest import SplAtConv2d as TorchSplAt
        from torch.nn import BatchNorm2d

        tm = TorchSplAt(8, 8, kernel_size=3, padding=1, stride=1, groups=2, radix=2,
                        norm_layer=BatchNorm2d)
        tm.eval()
        x = rng.standard_normal((2, 8, 12, 12), dtype=np.float32)
        with torch.no_grad():
            ty = tm(torch.from_numpy(x)).numpy()

        b = _TreeBuilder(_sd_numpy(tm))
        b.splat("", ())
        # strip the leading '.'-empty level: builder paths start at ('conv',...)
        variables = b.finish()

        jm = SplAtConv2d(in_channels=8, channels=8, kernel_size=3, padding=1,
                         strides=1, groups=2, radix=2)
        init_vars = jm.init(jax.random.PRNGKey(0), jnp.asarray(x).transpose(0, 2, 3, 1), False)
        variables = merge_variables(init_vars, variables)
        jy = jm.apply(variables, jnp.asarray(x).transpose(0, 2, 3, 1), False)
        jy = np.asarray(jy).transpose(0, 3, 1, 2)
        assert ty.shape == jy.shape
        assert _max_err(ty, jy) < 2e-4


class TestResNestDecoderUpsampling:
    def test_decoder_parity(self, torch_reference, rng):
        torch = torch_reference
        from architectures.extra.resnest import ResNestDecoder as TorchDec

        tm = TorchDec(16, 8)
        tm.eval()
        x = rng.standard_normal((2, 16, 10, 10), dtype=np.float32)
        with torch.no_grad():
            ty = tm(torch.from_numpy(x)).numpy()

        b = _TreeBuilder(_sd_numpy(tm))
        b.decoder("", ())
        # decoder() expects tkey+'.conv.0' → with tkey='' keys are '.conv.0';
        # rebuild with correct empty-prefix handling below
        variables = b.finish()

        jm = ResNestDecoder(16, 8)
        xj = jnp.asarray(x).transpose(0, 2, 3, 1)
        init_vars = jm.init(jax.random.PRNGKey(0), xj, False)
        variables = merge_variables(init_vars, variables)
        jy = np.asarray(jm.apply(variables, xj, False)).transpose(0, 3, 1, 2)
        assert _max_err(ty, jy) < 2e-4

    def test_upsampling_parity(self, torch_reference, rng):
        torch = torch_reference
        from architectures.extra.resnest import Upsampling as TorchUp

        tm = TorchUp(6, 4)
        tm.eval()
        x = rng.standard_normal((2, 6, 9, 9), dtype=np.float32)
        with torch.no_grad():
            ty = tm(torch.from_numpy(x)).numpy()

        b = _TreeBuilder(_sd_numpy(tm))
        b.conv_transpose("up", ())
        variables = b.finish()

        jm = Upsampling(6, 4)
        xj = jnp.asarray(x).transpose(0, 2, 3, 1)
        init_vars = jm.init(jax.random.PRNGKey(0), xj)
        variables = merge_variables(init_vars, variables)
        jy = np.asarray(jm.apply(variables, xj)).transpose(0, 3, 1, 2)
        assert _max_err(ty, jy) < 2e-4


class TestResNeSt50:
    @pytest.mark.slow
    def test_backbone_parity(self, torch_reference, rng):
        torch = torch_reference
        from architectures.extra.resnest import resnest50 as torch_resnest50

        tm = torch_resnest50(pretrained=False)
        tm.eval()
        x = rng.standard_normal((1, 3, 64, 64), dtype=np.float32)
        with torch.no_grad():
            ty = tm(torch.from_numpy(x)).numpy()

        variables = convert_resnest50(_sd_numpy(tm), with_fc=True)
        jm = resnest50()
        xj = jnp.asarray(x).transpose(0, 2, 3, 1)
        init_vars = jm.init(jax.random.PRNGKey(0), xj, False)
        variables = merge_variables(init_vars, variables)
        jy = np.asarray(jm.apply(variables, xj, False))
        assert ty.shape == jy.shape
        assert _max_err(ty, jy) < 5e-4


def test_bottleneck_splat_conv_init_distribution():
    """From-scratch init parity (ADVICE r1): inside Bottleneck the reference
    ResNet __init__ loop re-inits EVERY Conv2d — including SplAtConv2d's
    conv/fc1/fc2 — to N(0, sqrt(2/(kh*kw*out))) (reference extra/
    resnest.py:368-371). Check the empirical std of each kernel."""
    import math

    from octave_tpu.models.resnest import Bottleneck

    m = Bottleneck(inplanes=64, planes=64, radix=2, cardinality=1,
                   avd=True, is_first=False, has_downsample=True)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 64)), False)
    splat = v["params"]["conv2"]
    checked = 0
    for name in ("conv", "fc1", "fc2"):
        sub = splat[name]
        # Conv wrapper nests the flax conv under another "conv" level
        kern = np.asarray(sub["conv"]["kernel"] if "conv" in sub else sub["kernel"])
        n = kern.shape[0] * kern.shape[1] * kern.shape[3]
        want = math.sqrt(2.0 / n)
        got = float(kern.std())
        assert abs(got - want) / want < 0.1, (name, got, want)
        checked += 1
    assert checked == 3
