"""Low-level TPU-friendly ops with PyTorch-compatible semantics.

These are the building blocks the model zoo is assembled from. Everything is
NHWC (the TPU-native conv layout) and jit/XLA friendly: static shapes, no
data-dependent Python control flow.

Reference behaviors reproduced here (cited for parity checking):
  * MaxPool2d(kernel_size=3, stride=2, padding=1)
    (/root/reference/architectures/extra/resnest.py:340)
  * AvgPool2d(3, stride, padding=1) with count_include_pad=True (the default)
    used as the ResNeSt `avd` layer
    (/root/reference/architectures/extra/resnest.py:189)
  * AvgPool2d(kernel_size=stride, stride=stride, ceil_mode=True,
    count_include_pad=False) used for `avg_down` shortcuts
    (/root/reference/architectures/extra/resnest.py:383-387)
  * ConvTranspose2d(kernel_size=2, stride=2) used by `Upsampling`
    (/root/reference/architectures/extra/resnest.py:46-54)
  * torch.nn.functional.interpolate(mode='nearest') as used (via kornia) by
    InterlayerDivergence (/root/reference/architectures/segmentor/losses.py:126)
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


# ---------------------------------------------------------------------------
# Initializers (PyTorch-default compatible)
# ---------------------------------------------------------------------------

def kaiming_uniform_torch(a: float = math.sqrt(5.0)):
    """torch.nn.Conv2d default weight init, for HWIO conv kernels.

    torch: kaiming_uniform_(w, a=sqrt(5)) on OIHW, fan_in = I/g * kh * kw.
    bound = sqrt(6 / ((1 + a^2) * fan_in)).
    """

    def init(key, shape, dtype=jnp.float32):
        # HWIO: fan_in = kh * kw * I
        fan_in = shape[0] * shape[1] * shape[2]
        gain = math.sqrt(2.0 / (1.0 + a * a))
        bound = math.sqrt(3.0) * gain / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_conv_bias_init(fan_in: int):
    """torch Conv2d default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def resnet_conv_init():
    """The ResNet init override: N(0, sqrt(2/n)), n = kh*kw*out_channels.

    (/root/reference/architectures/extra/resnest.py:368-371)
    """

    def init(key, shape, dtype=jnp.float32):
        # HWIO
        n = shape[0] * shape[1] * shape[3]
        std = math.sqrt(2.0 / n)
        return std * jax.random.normal(key, shape, dtype)

    return init


def kaiming_normal_leaky(negative_slope: float = 0.01):
    """torch kaiming_normal_(nonlinearity='leaky_relu') for HWIO kernels.

    Used by the discriminator input conv
    (/root/reference/architectures/discriminator/blocks.py:48).
    """

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0] * shape[1] * shape[2]
        gain = math.sqrt(2.0 / (1.0 + negative_slope**2))
        std = gain / math.sqrt(fan_in)
        return std * jax.random.normal(key, shape, dtype)

    return init


def xavier_uniform():
    """torch xavier_uniform_ for HWIO kernels.

    Used by the discriminator output conv
    (/root/reference/architectures/discriminator/blocks.py:72).
    """

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0] * shape[1] * shape[2]
        fan_out = shape[0] * shape[1] * shape[3]
        bound = math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# ---------------------------------------------------------------------------
# Pooling (torch semantics)
# ---------------------------------------------------------------------------

def max_pool2d(x: jax.Array, kernel_size: int, stride: int, padding: int) -> jax.Array:
    """MaxPool2d over NHWC with symmetric zero-ish (−inf) padding."""
    # NB: init_value must be a Python scalar — an array init breaks the
    # reduce_window transpose rule under jit (JAX 0.9)
    neg_inf = -float("inf") if jnp.issubdtype(x.dtype, jnp.floating) else int(jnp.iinfo(x.dtype).min)
    return lax.reduce_window(
        x,
        neg_inf,
        lax.max,
        window_dimensions=(1, kernel_size, kernel_size, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def avg_pool2d(
    x: jax.Array,
    kernel_size: int,
    stride: int,
    padding: int = 0,
    count_include_pad: bool = True,
    ceil_mode: bool = False,
) -> jax.Array:
    """AvgPool2d over NHWC matching torch semantics.

    ceil_mode adds extra implicit right/bottom padding so the last partial
    window is kept; torch never counts that *extra* padding in the divisor
    (and with count_include_pad=False no padding is counted at all).
    """
    if kernel_size == 1 and stride == 1 and padding == 0:
        # degenerate identity pool (e.g. the dilated avg_down shortcut,
        # reference resnest.py:386-387); also sidesteps a reduce_window
        # autodiff limitation for 1x1 windows
        return x
    h, w = x.shape[1], x.shape[2]

    def out_size(n: int) -> int:
        if ceil_mode:
            o = -(-(n + 2 * padding - kernel_size) // stride) + 1
            # torch: last window must start inside the (left-padded) input
            if (o - 1) * stride >= n + padding:
                o -= 1
            return o
        return (n + 2 * padding - kernel_size) // stride + 1

    oh, ow = out_size(h), out_size(w)
    # right/bottom padding needed to realize ceil_mode windows
    pad_h_extra = max(0, (oh - 1) * stride + kernel_size - h - 2 * padding)
    pad_w_extra = max(0, (ow - 1) * stride + kernel_size - w - 2 * padding)

    pad_cfg = (
        (0, 0),
        (padding, padding + pad_h_extra),
        (padding, padding + pad_w_extra),
        (0, 0),
    )
    summed = lax.reduce_window(
        x,
        0.0,
        lax.add,
        window_dimensions=(1, kernel_size, kernel_size, 1),
        window_strides=(1, stride, stride, 1),
        padding=pad_cfg,
    )

    if count_include_pad and padding > 0:
        # torch counts the *explicit* padding but never the ceil_mode extra.
        ones = jnp.ones((1, h + 2 * padding, w + 2 * padding, 1), x.dtype)
        counts = lax.reduce_window(
            ones,
            0.0,
            lax.add,
            window_dimensions=(1, kernel_size, kernel_size, 1),
            window_strides=(1, stride, stride, 1),
            padding=((0, 0), (0, pad_h_extra), (0, pad_w_extra), (0, 0)),
        )
    elif count_include_pad and padding == 0 and (pad_h_extra or pad_w_extra):
        ones = jnp.ones((1, h, w, 1), x.dtype)
        counts = lax.reduce_window(
            ones,
            0.0,
            lax.add,
            window_dimensions=(1, kernel_size, kernel_size, 1),
            window_strides=(1, stride, stride, 1),
            padding=((0, 0), (0, pad_h_extra), (0, pad_w_extra), (0, 0)),
        )
    elif not count_include_pad:
        ones = jnp.ones((1, h, w, 1), x.dtype)
        counts = lax.reduce_window(
            ones,
            0.0,
            lax.add,
            window_dimensions=(1, kernel_size, kernel_size, 1),
            window_strides=(1, stride, stride, 1),
            padding=((0, 0), (padding, padding + pad_h_extra), (padding, padding + pad_w_extra), (0, 0)),
        )
    else:
        counts = jnp.asarray(kernel_size * kernel_size, x.dtype)
        return summed / counts
    return summed / counts


def adaptive_avg_pool2d(x: jax.Array, output_size: Tuple[int, int]) -> jax.Array:
    """torch F.adaptive_avg_pool2d over NHWC (static shapes only).

    Window for output index i spans [floor(i*n/o), ceil((i+1)*n/o)).
    """
    b, h, w, c = x.shape
    oh, ow = output_size
    if (oh, ow) == (1, 1):
        return jnp.mean(x, axis=(1, 2), keepdims=True)
    if h % oh == 0 and w % ow == 0:
        kh, kw = h // oh, w // ow
        return avg_pool2d(x, kh, kh, 0) if kh == kw else jnp.mean(
            x.reshape(b, oh, kh, ow, kw, c), axis=(2, 4)
        )
    # General case: precompute index windows host-side (static shapes).
    out_rows = []
    for i in range(oh):
        r0, r1 = (i * h) // oh, -(-((i + 1) * h) // oh)
        out_cols = []
        for j in range(ow):
            c0, c1 = (j * w) // ow, -(-((j + 1) * w) // ow)
            out_cols.append(jnp.mean(x[:, r0:r1, c0:c1, :], axis=(1, 2)))
        out_rows.append(jnp.stack(out_cols, axis=1))
    return jnp.stack(out_rows, axis=1)


# ---------------------------------------------------------------------------
# Nearest resize (torch F.interpolate mode='nearest' semantics)
# ---------------------------------------------------------------------------

def nearest_resize(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """NHWC nearest-neighbor resize with torch index convention.

    torch 'nearest': src = floor(dst * in / out). This is what kornia's
    resize(interpolation='nearest') reduces to in InterlayerDivergence
    (/root/reference/architectures/segmentor/losses.py:126).
    """
    h, w = x.shape[1], x.shape[2]
    oh, ow = size
    if (oh, ow) == (h, w):
        return x
    if oh % h == 0 and ow % w == 0:
        # Exact integer upscale == repeat; XLA lowers this to a cheap broadcast.
        fh, fw = oh // h, ow // w
        x = jnp.repeat(x, fh, axis=1)
        return jnp.repeat(x, fw, axis=2)
    rows = (np.arange(oh) * h) // oh
    cols = (np.arange(ow) * w) // ow
    return x[:, rows][:, :, cols]


# ---------------------------------------------------------------------------
# ConvTranspose2d(kernel_size=2, stride=2) as a pure matmul (MXU-friendly)
# ---------------------------------------------------------------------------

_CONV_TRANSPOSE_IMPL = "native"  # 'einsum' | 'native'


def set_conv_transpose_impl(impl: str) -> None:
    """Select the ConvTranspose2d lowering ('einsum' MXU matmul vs XLA's
    'native' conv_transpose). Both are torch-exact; relative speed is
    backend-dependent — 'native' measured +5% bf16 / +10% int8 end-to-end
    on v5e at B=256 (the einsum's block-interleaved output forces a 4.6 ms
    layout copy at the 304² stage, benchmarks/profile_int8.txt) and is the
    default since r2; see docs/architecture.md."""
    global _CONV_TRANSPOSE_IMPL
    assert impl in ("einsum", "native"), impl
    _CONV_TRANSPOSE_IMPL = impl

def conv_transpose_2x2(x: jax.Array, kernel: jax.Array, bias: jax.Array | None = None) -> jax.Array:
    """Non-overlapping 2x stride-2 transposed conv as a single einsum.

    Each input pixel expands to an independent 2x2 output block, so the op is
    exactly one (B*H*W, C) x (C, 4*O) matmul + reshape — this maps straight
    onto the MXU with no conv lowering. `kernel` layout: (C_in, C_out, 2, 2)
    (torch ConvTranspose2d layout, kept for converter simplicity).
    """
    b, h, w, cin = x.shape
    cout = kernel.shape[1]
    if _CONV_TRANSPOSE_IMPL == "native":
        # XLA's conv_transpose lowering writes the strided output directly
        # (no interleave transpose). torch parity: spatially flipped HWIO.
        wk = jnp.transpose(kernel[:, :, ::-1, ::-1], (2, 3, 0, 1))
        y = lax.conv_transpose(
            x, wk.astype(x.dtype), (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    else:
        # one MXU matmul; emit the block-interleaved order straight from the
        # einsum so the final reshape is a free view
        y = jnp.einsum("bhwc,coij->bhiwjo", x, kernel, preferred_element_type=x.dtype)
        y = y.reshape(b, 2 * h, 2 * w, cout)
    if bias is not None:
        y = y + bias
    return y
