"""ResNeSt-50 split-attention backbone and U-Net decoder blocks, TPU-native.

Re-designed from the behavior of /root/reference/architectures/extra/resnest.py
(PyTorch) as NHWC Flax modules: convs lower to MXU matmuls, the 2x2 stride-2
transposed conv is a single einsum, and pooling uses lax.reduce_window with
torch-exact padding/count semantics (see octave_tpu/ops/common.py).

Parity map (reference file:line → here):
  * SplAtConv2d            resnest.py:57-138  → SplAtConv2d
  * Bottleneck             resnest.py:170-267 → Bottleneck
  * BasicBlock             resnest.py:142-167 → BasicBlock
  * ResNet                 resnest.py:277-449 → ResNeSt
  * resnest50 config       resnest.py:451-459 → resnest50()
  * ResNestDecoder         resnest.py:18-43   → ResNestDecoder
  * Upsampling             resnest.py:46-54   → Upsampling
  * conv3x3                resnest.py:11-16   → (inline nn.Conv)
  * build_resnet (CE-Net)  resnest.py:462-511 → BuildResNet

The radix==1 branch of the reference calls `F.sigmoid(atten, dim=1)` which is
a TypeError (dead code at radix=2, resnest.py:129); we implement the intended
sigmoid gate instead — documented deviation.
"""
from __future__ import annotations

import dataclasses
import threading
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from flax import linen as nn

from octave_tpu.ops.common import (
    avg_pool2d,
    conv_transpose_2x2,
    kaiming_uniform_torch,
    max_pool2d,
    resnet_conv_init,
    torch_conv_bias_init,
)
from octave_tpu.ops import quant
from octave_tpu.ops.norm import BatchNorm


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return (v, v)


def conv3x3(features: int, strides: int = 1, name: str = None) -> "Conv":
    """3x3 same-padded conv factory (resnest.py:11-16)."""
    return Conv(features, 3, strides, 1, use_bias=False, name=name)


def global_avg_pool_2d(x: jax.Array) -> jax.Array:
    """GlobalAvgPool2d (resnest.py:269-275): NHWC → (B, C)."""
    return jnp.mean(x, axis=(1, 2))


import contextlib


class _GroupsAsDenseSwitch(threading.local):
    """Trace-time switch: lower grouped convs as dense convs with
    block-diagonal kernels. XLA's grouped-conv lowering for small per-group
    channel counts produces dilated 3D-conv tricks that run far below MXU
    efficiency; the dense form does groups× the FLOPs at dense efficiency and
    reads the same activations (these ops are bandwidth-dominated). Exact
    math: parameters stay in grouped shape, the block-diagonal expansion's
    scatter transpose drops off-block gradients.

    `include` optionally scopes the lowering by module path (global dense
    measured slower in r1 — the encoder's wide grouped convs pay real extra
    FLOPs; the narrow decoder splat convs are the candidates).

    Thread-LOCAL so concurrent Predictor traces on different threads can't
    contaminate each other (VERDICT r3 item 9)."""

    def __init__(self):
        self.active = False
        self.include = None

    def should(self, mod) -> bool:
        if not self.active:
            return False
        if self.include is None:
            return True
        return self.include("/".join(str(p) for p in mod.scope.path))


_GroupsAsDense = _GroupsAsDenseSwitch()


class _GroupsAsEinsumSwitch(threading.local):
    """Trace-time switch: lower grouped convs as kh*kw shifted batched
    matmuls (einsum 'bhwgi,igo->bhwgo', one per kernel tap, summed).

    Motivation (VERDICT r4 item 3): XLA's feature_group_count lowering and
    its transpose (dgrad) / batch_group wgrad dominate the train-step long
    tail. The einsum form keeps the exact grouped FLOP count but lowers fwd
    AND both backward passes to plain batched matmuls with K=ci, N=co per
    group — shapes the MXU tiles directly, with no windowed-conv loop
    nests (also a far smaller generated-code footprint, which matters on
    the relay compile helper — train_scaling.json's HTTP-500 rows).

    Exact math: parameters stay in grouped (kh,kw,ci,g*co) shape; the
    reshape/slice bookkeeping is bijective so gradients flow identically.
    Thread-LOCAL like _GroupsAsDenseSwitch."""

    def __init__(self):
        self.active = False
        self.include = None

    def should(self, mod) -> bool:
        if not self.active:
            return False
        if self.include is None:
            return True
        return self.include("/".join(str(p) for p in mod.scope.path))


_GroupsAsEinsum = _GroupsAsEinsumSwitch()


@contextlib.contextmanager
def groups_as_dense(include=None):
    prev = (_GroupsAsDense.active, _GroupsAsDense.include)
    _GroupsAsDense.active, _GroupsAsDense.include = True, include
    try:
        yield
    finally:
        _GroupsAsDense.active, _GroupsAsDense.include = prev


@contextlib.contextmanager
def groups_as_einsum(include=None):
    prev = (_GroupsAsEinsum.active, _GroupsAsEinsum.include)
    _GroupsAsEinsum.active, _GroupsAsEinsum.include = True, include
    try:
        yield
    finally:
        _GroupsAsEinsum.active, _GroupsAsEinsum.include = prev


def grouped_conv_einsum(x, kernel, groups, strides=(1, 1),
                        padding=((0, 0), (0, 0)), dilation=(1, 1)):
    """Grouped conv over NHWC as kh*kw shifted batched matmuls.

    ``kernel`` is the grouped HWIO layout (kh, kw, ci, g*co) — identical to
    what feature_group_count consumes, so parameters are unchanged. Each
    kernel tap (iy, ix) contributes einsum('bhwgi,igo->bhwgo') on the
    spatially shifted input; taps sum into the output. Exact same math as
    lax.conv_general_dilated(..., feature_group_count=groups).
    """
    b, _, _, cin = x.shape
    kh, kw, ci, feat = kernel.shape
    g = groups
    co = feat // g
    assert cin == ci * g, (cin, ci, g)
    (pt, pb), (pl, pr) = padding
    sh, sw = strides
    dh, dw = dilation
    if pt or pb or pl or pr:
        x = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    hp, wp = x.shape[1], x.shape[2]
    ho = (hp - (kh - 1) * dh - 1) // sh + 1
    wo = (wp - (kw - 1) * dw - 1) // sw + 1
    xg = x.reshape(b, hp, wp, g, ci)
    kg = kernel.reshape(kh, kw, ci, g, co)
    out = None
    for iy in range(kh):
        for ix in range(kw):
            xs = jax.lax.slice(
                xg,
                (0, iy * dh, ix * dw, 0, 0),
                (b, iy * dh + (ho - 1) * sh + 1, ix * dw + (wo - 1) * sw + 1,
                 g, ci),
                (1, sh, sw, 1, 1),
            )
            t = jnp.einsum("bhwgi,igo->bhwgo", xs, kg[iy, ix])
            out = t if out is None else out + t
    return out.reshape(b, ho, wo, feat)


def dense_groups_include(spec: str):
    """Parse a `dense_groups` spec into a module-path include callback.

    'all'            → every grouped conv
    'decoder'        → every decoder-stage grouped conv (decoder_*)
    'decoder:<digits>' → only the named decoder stages, e.g. 'decoder:01'
      lowers decoder_0/decoder_1 dense and leaves the rest grouped. The
      per-stage split exists because the win is stage-dependent: the narrow
      stages (decoder_0/1 run 8-16 channels per group, far under the MXU's
      128 lanes) gain from dense lowering while the wide stages (decoder_3/4
      already fill the lanes) just pay dense's 4x FLOPs — measured per stage
      fwd+bwd in benchmarks/grouped_conv_ab.json.
    """
    if spec == "all":
        return None
    preds = []
    for part in spec.split("+"):
        if part == "decoder":
            preds.append(lambda p: p.startswith("decoder_"))
        elif part.startswith("decoder:"):
            digits = part.split(":", 1)[1]
            if not digits or not digits.isdigit():
                raise ValueError(
                    f"bad dense_groups stage list {spec!r}; expected e.g. 'decoder:01'"
                )
            names = tuple(f"decoder_{d}" for d in digits)
            preds.append(lambda p, names=names: p.startswith(names))
        elif part == "enc":
            # backbone SplAt convs (blocks named layer{N}_{i})
            preds.append(lambda p: "layer" in p)
        else:
            raise ValueError(
                f"unknown dense_groups {spec!r}; expected None | 'decoder' | "
                "'decoder:<digits>' | 'enc' | 'all' or '+'-joined combinations"
            )
    if len(preds) == 1:
        return preds[0]
    return lambda p: any(f(p) for f in preds)


class Conv(nn.Module):
    """2D conv over NHWC with torch-default init and explicit padding."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    dilation: Tuple[int, int] = (1, 1)
    groups: int = 1
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = _pair(self.kernel_size)
        in_ch = x.shape[-1]
        fan_in = (in_ch // self.groups) * kh * kw
        kinit = self.kernel_init or kaiming_uniform_torch()
        binit = self.bias_init or torch_conv_bias_init(fan_in)
        ph, pw = _pair(self.padding)

        quant.record_absmax(self, x)
        q_scale = quant.scale_for(self)
        if q_scale is not None:
            # int8 PTQ serving path (ops/quant.py): same param tree as
            # nn.Conv (conv/{kernel,bias}), int8 conv + fused dequant.
            leaf = _ConvParams(
                (kh, kw, in_ch // self.groups, self.features), kinit,
                (self.features,) if self.use_bias else None, binit, name="conv",
            )
            kernel, bias = leaf()
            groups = self.groups
            if groups > 1 and _GroupsAsDense.should(self):
                # block-diagonal dense expansion composes with int8: the
                # per-out-channel weight scales are unchanged (same absmax)
                g, ci, co = groups, in_ch // groups, self.features // groups
                dense = jnp.zeros((kh, kw, in_ch, self.features), kernel.dtype)
                for gi in range(g):
                    dense = dense.at[
                        :, :, gi * ci : (gi + 1) * ci, gi * co : (gi + 1) * co
                    ].set(kernel[:, :, :, gi * co : (gi + 1) * co])
                kernel, groups = dense, 1
            return quant.int8_conv(
                x, kernel, bias, q_scale,
                strides=_pair(self.strides), padding=[(ph, ph), (pw, pw)],
                dilation=_pair(self.dilation), groups=groups,
            )

        if self.groups > 1 and _GroupsAsEinsum.should(self):
            # same param path as nn.Conv: conv/{kernel,bias}
            leaf = _ConvParams(
                (kh, kw, in_ch // self.groups, self.features), kinit,
                (self.features,) if self.use_bias else None, binit, name="conv",
            )
            kernel, bias = leaf()
            y = grouped_conv_einsum(
                x, kernel, self.groups, strides=_pair(self.strides),
                padding=((ph, ph), (pw, pw)), dilation=_pair(self.dilation),
            )
            if bias is not None:
                y = y + bias
            return checkpoint_name(y, "conv_out")

        if self.groups > 1 and _GroupsAsDense.should(self):
            g = self.groups
            ci = in_ch // g
            co = self.features // g
            # same param path as nn.Conv: conv/{kernel,bias}
            leaf = _ConvParams(
                (kh, kw, ci, self.features), kinit,
                (self.features,) if self.use_bias else None, binit, name="conv",
            )
            kernel, bias = leaf()
            dense = jnp.zeros((kh, kw, in_ch, self.features), kernel.dtype)
            for gi in range(g):
                dense = dense.at[
                    :, :, gi * ci : (gi + 1) * ci, gi * co : (gi + 1) * co
                ].set(kernel[:, :, :, gi * co : (gi + 1) * co])
            y = jax.lax.conv_general_dilated(
                x, dense, _pair(self.strides), [(ph, ph), (pw, pw)],
                rhs_dilation=_pair(self.dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if bias is not None:
                y = y + bias
            return y

        y = nn.Conv(
            features=self.features,
            kernel_size=(kh, kw),
            strides=_pair(self.strides),
            padding=[(ph, ph), (pw, pw)],
            kernel_dilation=_pair(self.dilation),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=kinit,
            bias_init=binit,
            name="conv",
        )(x)
        # selective-remat anchor: with StepConfig.remat='conv' the train
        # step saves exactly these conv outputs and recomputes the cheap
        # norm/activation ops between them in the backward (steps.py)
        return checkpoint_name(y, "conv_out")


class _ConvParams(nn.Module):
    """{kernel, bias} leaf with nn.Conv's naming (for the dense-grouped path)."""

    kshape: Tuple[int, ...]
    kinit: Callable
    bshape: Optional[Tuple[int, ...]]
    binit: Callable

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kinit, self.kshape)
        b = self.param("bias", self.binit, self.bshape) if self.bshape else None
        return k, b


class _NamedConvParams(nn.Module):
    """Adds the Conv wrapper's extra 'conv' path level around _ConvParams."""

    kshape: Tuple[int, ...]
    kinit: Callable
    bshape: Optional[Tuple[int, ...]]
    binit: Callable

    @nn.compact
    def __call__(self):
        return _ConvParams(self.kshape, self.kinit, self.bshape, self.binit, name="conv")()


class SplAtConv2d(nn.Module):
    """Split-attention conv (radix-softmax channel attention).

    Behavioral contract from resnest.py:57-138: grouped conv to C*radix
    channels → BN → ReLU → split into radix chunks → sum → global average
    pool → fc1 (grouped 1x1, ≥32 inter channels) → BN → ReLU → fc2 (grouped
    1x1 → C*radix) → softmax over radix → attention-weighted sum of splits.
    """

    in_channels: int
    channels: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1  # cardinality
    use_bias: bool = True
    radix: int = 2
    reduction_factor: int = 4
    use_bn: bool = True
    bn_axis_name: Optional[str] = None
    # Inside ResNet, the reference's __init__ loop re-inits EVERY Conv2d —
    # including SplAtConv2d's conv/fc1/fc2 — to N(0, sqrt(2/fan_out))
    # (reference resnest.py:307-312); Bottleneck threads resnet_conv_init
    # through here. Standalone (None) keeps the torch-default kaiming-uniform.
    conv_init: Optional[Callable] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, return_parts: bool = False
    ) -> jax.Array:
        """With return_parts=True (radix>1 only), stops before the radix-
        softmax apply and returns (z, attn_logits): z (b,h,w,C*radix) is the
        post-BN0+ReLU conv output, attn_logits (b, C*radix) the raw fc2
        logits laid out [radix0 channels..., radix1 channels...]. The fused
        decoder-epilogue Pallas kernel consumes these and performs the apply
        itself (ops/pallas/decoder_epilogue.py)."""
        radix, channels = self.radix, self.channels
        inter_channels = max(self.in_channels * radix // self.reduction_factor, 32)
        kinit = self.conv_init

        x = Conv(
            features=channels * radix,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.groups * radix,
            use_bias=self.use_bias,
            kernel_init=kinit,
            name="conv",
        )(x)
        if self.use_bn:
            x = BatchNorm(channels * radix, axis_name=self.bn_axis_name, name="bn0")(x, train)
        x = nn.relu(x)

        b, h, w, _ = x.shape
        if radix > 1:
            # torch.split(dim=1) chunks contiguous channels. Static channel
            # slices + elementwise adds (NOT a 5-D reshape/einsum): slicing
            # keeps the NHWC minor-dim layout so XLA fuses these into the
            # surrounding convs — the einsum form forced NCHW relayouts and
            # materialized copies (~3 ms/block at 304², batch 128).
            splits = [x[..., r * channels : (r + 1) * channels] for r in range(radix)]
            gap = splits[0]
            for s in splits[1:]:
                gap = gap + s
        else:
            gap = x
        gap = jnp.mean(gap, axis=(1, 2), keepdims=True)  # (b,1,1,channels)
        gap = Conv(features=inter_channels, kernel_size=1, groups=self.groups,
                   kernel_init=kinit, name="fc1")(gap)
        if self.use_bn:
            gap = BatchNorm(inter_channels, axis_name=self.bn_axis_name, name="bn1")(gap, train)
        gap = nn.relu(gap)
        atten = Conv(features=channels * radix, kernel_size=1, groups=self.groups,
                     kernel_init=kinit, name="fc2")(gap)
        if return_parts:
            if radix != 2:
                raise NotImplementedError("return_parts requires radix=2")
            return x, atten.reshape(b, channels * radix)
        if radix > 1:
            # softmax over radix for each channel c: entries c, c+channels, …
            logits = atten.reshape(b, radix, channels)
            attn = jax.nn.softmax(logits, axis=1)  # (b, radix, channels) — tiny
            out = attn[:, 0, :][:, None, None, :] * splits[0]
            for r in range(1, radix):
                out = out + attn[:, r, :][:, None, None, :] * splits[r]
        else:
            out = jax.nn.sigmoid(atten.reshape(b, 1, 1, channels)) * x
        return out


class BasicBlock(nn.Module):
    """CE-Net-compat basic residual block (resnest.py:142-167)."""

    expansion = 1
    inplanes: int
    planes: int
    strides: int = 1
    has_downsample: bool = False
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        residual = x
        out = Conv(self.planes, 3, self.strides, 1, use_bias=False, name="conv1")(x)
        out = BatchNorm(self.planes, axis_name=self.bn_axis_name, name="bn1")(out, train)
        out = nn.relu(out)
        out = Conv(self.planes, 3, 1, 1, use_bias=False, name="conv2")(out)
        out = BatchNorm(self.planes, axis_name=self.bn_axis_name, name="bn2")(out, train)
        if self.has_downsample:
            residual = Conv(self.planes, 1, self.strides, 0, use_bias=False, name="downsample_conv")(x)
            residual = BatchNorm(self.planes, axis_name=self.bn_axis_name, name="downsample_bn")(residual, train)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """ResNeSt bottleneck with split-attention conv2 and avd pooling.

    (resnest.py:170-267). `avd` replaces the strided 3x3 with a stride-1
    split-attention conv followed by AvgPool2d(3, stride, padding=1)
    (avd_first=False in resnest50).
    """

    expansion = 4
    inplanes: int
    planes: int
    strides: int = 1
    has_downsample: bool = False
    radix: int = 1
    cardinality: int = 1
    bottleneck_width: int = 64
    avd: bool = False
    avd_first: bool = False
    dilation: int = 1
    is_first: bool = False
    avg_down: bool = False
    conv_init: Optional[Callable] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        group_width = int(self.planes * (self.bottleneck_width / 64.0)) * self.cardinality
        avd = self.avd and (self.strides > 1 or self.is_first)
        stride = 1 if avd else self.strides
        kinit = self.conv_init or resnet_conv_init()

        out = Conv(group_width, 1, 1, 0, use_bias=False, kernel_init=kinit, name="conv1")(x)
        out = BatchNorm(group_width, axis_name=self.bn_axis_name, name="bn1")(out, train)
        out = nn.relu(out)

        if avd and self.avd_first:
            out = avg_pool2d(out, 3, self.strides, 1)

        if self.radix > 1:
            out = SplAtConv2d(
                in_channels=group_width,
                channels=group_width,
                kernel_size=3,
                strides=stride,
                padding=self.dilation,
                dilation=self.dilation,
                groups=self.cardinality,
                use_bias=False,
                radix=self.radix,
                bn_axis_name=self.bn_axis_name,
                conv_init=kinit,
                name="conv2",
            )(out, train)
        else:
            out = Conv(
                group_width, 3, stride, self.dilation, dilation=self.dilation,
                groups=self.cardinality, use_bias=False, kernel_init=kinit, name="conv2",
            )(out)
            out = BatchNorm(group_width, axis_name=self.bn_axis_name, name="bn2")(out, train)
            out = nn.relu(out)

        if avd and not self.avd_first:
            out = avg_pool2d(out, 3, self.strides, 1)

        out = Conv(self.planes * 4, 1, 1, 0, use_bias=False, kernel_init=kinit, name="conv3")(out)
        out = BatchNorm(self.planes * 4, axis_name=self.bn_axis_name, name="bn3")(out, train)

        residual = x
        if self.has_downsample:
            if self.avg_down:
                if self.dilation == 1:
                    residual = avg_pool2d(
                        residual, self.strides, self.strides, 0,
                        count_include_pad=False, ceil_mode=True,
                    )
                residual = Conv(
                    self.planes * 4, 1, 1, 0, use_bias=False, kernel_init=kinit,
                    name="downsample_conv",
                )(residual)
            else:
                residual = Conv(
                    self.planes * 4, 1, self.strides, 0, use_bias=False, kernel_init=kinit,
                    name="downsample_conv",
                )(x)
            residual = BatchNorm(
                self.planes * 4, axis_name=self.bn_axis_name, name="downsample_bn"
            )(residual, train)

        return nn.relu(out + residual)


@dataclasses.dataclass(frozen=True)
class ResNeStConfig:
    """Static architecture config (mirrors the ResNet __init__ kwargs,
    resnest.py:298-304)."""

    layers: Tuple[int, ...] = (3, 4, 6, 3)
    radix: int = 2
    groups: int = 1
    bottleneck_width: int = 64
    num_classes: int = 1000
    deep_stem: bool = True
    stem_width: int = 32
    avg_down: bool = True
    avd: bool = True
    avd_first: bool = False
    final_drop: float = 0.0
    dilated: bool = False
    dilation: int = 1


class ResNeSt(nn.Module):
    """ResNeSt backbone with individually callable encoder stages.

    The segmentor taps `stem` / `maxpool` / `layer1..4` directly
    (compose.py:40-77), so each stage is exposed as a method instead of a
    monolithic __call__.
    """

    config: ResNeStConfig = ResNeStConfig()
    bn_axis_name: Optional[str] = None
    # Block-granular rematerialization (StepConfig.remat='block'): each
    # Bottleneck is its own jax.checkpoint region, so the backward holds only
    # inter-block residuals (a few MB/level) plus ONE block's internals at a
    # time. A single checkpoint region over the whole forward (remat=True)
    # recomputes everything at the start of the backward and holds it all —
    # measured: it saves just 0.78 GB of 15.26 GB at B=64/304²
    # (benchmarks/train_scaling.json memory_analysis rows).
    remat_blocks: bool = False
    # with remat_blocks: each Bottleneck region saves its conv outputs (the
    # 'conv_out' anchors below), so its backward recomputes only the
    # elementwise/norm chain — never a convolution
    remat_save_convs: bool = False
    # with remat_blocks: which encoder layers (1-based, 1..4) get remated
    # Bottlenecks. True = all (the default). A set of indices leaves the
    # other layers' activations saved — their backward skips the forward
    # recompute, the same trade the decoder makes per stage
    # (segmentor.py remat_blocks index sets). Low-res layers 3-4 (19²/10²
    # at 304² input) are the cheap-to-save candidates.
    remat_layers: object = True

    def setup(self):
        cfg = self.config
        rkw = {}
        if self.remat_save_convs:
            rkw["policy"] = jax.checkpoint_policies.save_only_these_names(
                "conv_out"
            )

        def layer_blk_cls(li1: int):
            """Block class for 1-based encoder layer li1."""
            if not self.remat_blocks:
                return Bottleneck
            rl = self.remat_layers
            if rl is True or (isinstance(rl, (tuple, list, set, frozenset))
                              and li1 in rl):
                return nn.remat(Bottleneck, static_argnums=(2,), **rkw)
            return Bottleneck
        kinit = resnet_conv_init()
        self.inplanes0 = cfg.stem_width * 2 if cfg.deep_stem else 64
        if cfg.deep_stem:
            self.stem_conv1 = Conv(cfg.stem_width, 3, 2, 1, use_bias=False, kernel_init=kinit, name="stem_conv1")
            self.stem_bn1 = BatchNorm(cfg.stem_width, axis_name=self.bn_axis_name, name="stem_bn1")
            self.stem_conv2 = Conv(cfg.stem_width, 3, 1, 1, use_bias=False, kernel_init=kinit, name="stem_conv2")
            self.stem_bn2 = BatchNorm(cfg.stem_width, axis_name=self.bn_axis_name, name="stem_bn2")
            self.stem_conv3 = Conv(cfg.stem_width * 2, 3, 1, 1, use_bias=False, kernel_init=kinit, name="stem_conv3")
        else:
            self.stem_conv1 = Conv(64, 7, 2, 3, use_bias=False, kernel_init=kinit, name="stem_conv1")
        self.bn1 = BatchNorm(self.inplanes0, axis_name=self.bn_axis_name, name="bn1")

        # stage plan mirroring ResNet._make_layer (resnest.py:376-429)
        if cfg.dilated or cfg.dilation == 4:
            strides = (1, 2, 1, 1)
            dilations = (1, 1, 2, 4)
        elif cfg.dilation == 2:
            strides = (1, 2, 2, 1)
            dilations = (1, 1, 1, 2)
        else:
            strides = (1, 2, 2, 2)
            dilations = (1, 1, 1, 1)

        inplanes = self.inplanes0
        stages: List[List[Bottleneck]] = []
        for li, (planes, blocks) in enumerate(zip((64, 128, 256, 512), cfg.layers)):
            blk_cls = layer_blk_cls(li + 1)
            stride, dil = strides[li], dilations[li]
            is_first = li != 0  # _make_layer called with is_first=False only for layer1
            first_dil = 1 if dil in (1, 2) else 2
            blocks_l = []
            for bi in range(blocks):
                if bi == 0:
                    has_down = stride != 1 or inplanes != planes * 4
                    blocks_l.append(
                        blk_cls(
                            inplanes=inplanes, planes=planes, strides=stride,
                            has_downsample=has_down, radix=cfg.radix,
                            cardinality=cfg.groups, bottleneck_width=cfg.bottleneck_width,
                            avd=cfg.avd, avd_first=cfg.avd_first, dilation=first_dil,
                            is_first=is_first, avg_down=cfg.avg_down,
                            bn_axis_name=self.bn_axis_name,
                            name=f"layer{li + 1}_{bi}",
                        )
                    )
                    inplanes = planes * 4
                else:
                    blocks_l.append(
                        blk_cls(
                            inplanes=inplanes, planes=planes, strides=1,
                            has_downsample=False, radix=cfg.radix,
                            cardinality=cfg.groups, bottleneck_width=cfg.bottleneck_width,
                            avd=cfg.avd, avd_first=cfg.avd_first, dilation=dil,
                            is_first=False, avg_down=cfg.avg_down,
                            bn_axis_name=self.bn_axis_name,
                            name=f"layer{li + 1}_{bi}",
                        )
                    )
            stages.append(blocks_l)
        self.stage1, self.stage2, self.stage3, self.stage4 = stages

        self.fc = nn.Dense(cfg.num_classes, name="fc")

    # -- encoder stage methods -------------------------------------------
    def stem(self, x: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.config
        if cfg.deep_stem:
            x = self.stem_conv1(x)
            x = nn.relu(self.stem_bn1(x, train))
            x = self.stem_conv2(x)
            x = nn.relu(self.stem_bn2(x, train))
            x = self.stem_conv3(x)
        else:
            x = self.stem_conv1(x)
        return nn.relu(self.bn1(x, train))

    def maxpool(self, x: jax.Array) -> jax.Array:
        return max_pool2d(x, 3, 2, 1)

    def _run_stage(self, blocks, x: jax.Array, train: bool) -> jax.Array:
        for blk in blocks:
            x = blk(x, train)
        return x

    def layer1(self, x, train: bool = False):
        return self._run_stage(self.stage1, x, train)

    def layer2(self, x, train: bool = False):
        return self._run_stage(self.stage2, x, train)

    def layer3(self, x, train: bool = False):
        return self._run_stage(self.stage3, x, train)

    def layer4(self, x, train: bool = False):
        return self._run_stage(self.stage4, x, train)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """Full ImageNet-style classification forward (resnest.py:431-449)."""
        x = self.stem(x, train)
        x = self.maxpool(x)
        x = self.layer1(x, train)
        x = self.layer2(x, train)
        x = self.layer3(x, train)
        x = self.layer4(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return self.fc(x)


def resnest50(num_classes: int = 1000, bn_axis_name: Optional[str] = None) -> ResNeSt:
    """The resnest50 configuration (resnest.py:451-455).

    Pretrained `.pth` weights load via
    octave_tpu/utils/torch_convert.py, not here — checkpoint IO is a
    framework concern, not a model concern.
    """
    return ResNeSt(
        config=ResNeStConfig(
            layers=(3, 4, 6, 3), radix=2, groups=1, bottleneck_width=64,
            num_classes=num_classes, deep_stem=True, stem_width=32,
            avg_down=True, avd=True, avd_first=False,
        ),
        bn_axis_name=bn_axis_name,
    )


class ResNestDecoder(nn.Module):
    """U-Net decoder residual block (resnest.py:18-43).

    [3x3 conv → BN → ReLU → SplAtConv2d(groups=2, radix=2) → ReLU] plus a
    1x1-conv+BN shortcut, joined by ReLU(residual + out).

    Accepts either the concatenated skip+up tensor, or the (skip, up) pair:
    convolution is linear in input channels, so conv(cat(a,b), W) =
    conv(a, W[:, :, :Ca]) + conv(b, W[:, :, Ca:]) — the pair form never
    materializes the concat (a full read+write of the widest tensor in every
    decoder stage). Parameters are identical either way.
    """

    in_channels: int
    out_channels: int
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False, aag_kb=None):
        """aag_kb: optional (kernel (C,K), bias (K,)) of the attention gate
        that follows this block. When given (eval only), the block's tail —
        radix-softmax apply, inner ReLU, shortcut-BN affine + residual add,
        outer ReLU, and the AAG itself — runs as ONE fused Pallas pass
        (ops/pallas/decoder_epilogue.py) and the call returns
        (gated, y_hat) instead of the plain output. The parameter tree is
        identical either way."""
        if isinstance(x, tuple):
            a, b = x
            ca = a.shape[-1]

            def split_conv(features, k, pad, name):
                # param path <name>/conv/kernel, identical to the Conv wrapper
                leaf = _NamedConvParams(
                    (k, k, self.in_channels, features), kaiming_uniform_torch(),
                    None, torch_conv_bias_init(self.in_channels * k * k), name=name,
                )
                kernel, _ = leaf()
                # int8 PTQ (ops/quant.py): per-operand activation scales —
                # skip and upsample branches have different ranges.
                quant.record_absmax(self, a, f"{name}_a_absmax")
                quant.record_absmax(self, b, f"{name}_b_absmax")
                qa = quant.scale_for(self, f"{name}_a_absmax")
                qb = quant.scale_for(self, f"{name}_b_absmax")
                if qa is not None and qb is not None:
                    pad2 = [(pad, pad), (pad, pad)]
                    return (
                        quant.int8_conv(a, kernel[:, :, :ca, :], None, qa, padding=pad2)
                        + quant.int8_conv(b, kernel[:, :, ca:, :], None, qb, padding=pad2)
                    )
                args = dict(
                    window_strides=(1, 1), padding=[(pad, pad), (pad, pad)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                return checkpoint_name(
                    jax.lax.conv_general_dilated(a, kernel[:, :, :ca, :], **args)
                    + jax.lax.conv_general_dilated(b, kernel[:, :, ca:, :], **args),
                    "conv_out",
                )

            out = split_conv(self.out_channels, 3, 1, "conv1")
            residual = split_conv(self.out_channels, 1, 0, "downsample_conv")
        else:
            out = Conv(self.out_channels, 3, 1, 1, use_bias=False, name="conv1")(x)
            residual = Conv(self.out_channels, 1, 1, 0, use_bias=False, name="downsample_conv")(x)

        out = BatchNorm(self.out_channels, axis_name=self.bn_axis_name, name="bn1")(out, train)
        out = nn.relu(out)
        splat = SplAtConv2d(
            in_channels=self.out_channels, channels=self.out_channels,
            kernel_size=3, padding=1, strides=1, groups=2, radix=2,
            use_bias=True, bn_axis_name=self.bn_axis_name, name="splat",
        )
        res_bn = BatchNorm(self.out_channels, axis_name=self.bn_axis_name,
                           name="downsample_bn")

        if aag_kb is not None and not train:
            from octave_tpu.ops.pallas.decoder_epilogue import fused_decoder_epilogue

            z, attn = splat(out, train, return_parts=True)
            # the eval-mode shortcut BN is a per-channel affine; probe it on
            # (1,1,1,C) constants instead of paying a full-tensor HBM pass —
            # the kernel applies the affine in-register. Works identically
            # with raw or folded batch stats.
            probe = jnp.zeros((1, 1, 1, self.out_channels), residual.dtype)
            b0 = res_bn(probe, False)
            a = res_bn(probe + 1.0, False) - b0
            return fused_decoder_epilogue(
                z, attn, residual,
                a.reshape(-1), b0.reshape(-1), aag_kb[0], aag_kb[1],
            )

        out = splat(out, train)
        out = nn.relu(out)
        residual = res_bn(residual, train)
        return nn.relu(residual + out)


class Upsampling(nn.Module):
    """ConvTranspose2d(kernel_size=2, stride=2) (resnest.py:46-54), lowered
    to one MXU matmul (see conv_transpose_2x2)."""

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # torch ConvTranspose2d weight layout (in, out, kh, kw); default init
        # kaiming_uniform(a=sqrt(5)) with fan_in computed on (in, out, k, k)
        # as out*kh*kw... torch uses weight.size(1)*kh*kw = out*k*k.
        fan_in = self.out_channels * 4

        def kinit(key, shape, dtype=jnp.float32):
            bound = 1.0 / jnp.sqrt(fan_in)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        kernel = self.param("kernel", kinit, (self.in_channels, self.out_channels, 2, 2))
        bias = self.param("bias", torch_conv_bias_init(fan_in), (self.out_channels,))
        quant.record_absmax(self, x)
        q_scale = quant.scale_for(self)
        if q_scale is not None:
            return quant.int8_conv_transpose_2x2(x, kernel, bias, q_scale)
        return checkpoint_name(
            conv_transpose_2x2(x, kernel, bias), "conv_out"
        )


class BuildResNet(nn.Module):
    """CE-Net ResNet factory compat (resnest.py:462-511): plain ResNet trunk
    of BasicBlocks, returning the layer4 feature map."""

    layers: Tuple[int, ...] = (3, 4, 6, 3)
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = Conv(64, 7, 2, 3, use_bias=False, name="conv1")(x)
        x = BatchNorm(64, axis_name=self.bn_axis_name, name="bn1")(x, train)
        x = nn.relu(x)
        x = max_pool2d(x, 3, 2, 1)
        inplanes = 64
        for li, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stride = 1 if li == 0 else 2
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                has_down = bi == 0 and (s != 1 or inplanes != planes)
                x = BasicBlock(
                    inplanes=inplanes, planes=planes, strides=s,
                    has_downsample=has_down, bn_axis_name=self.bn_axis_name,
                    name=f"layer{li + 1}_{bi}",
                )(x, train)
                inplanes = planes
        return x
