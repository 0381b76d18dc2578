"""ROSE coarse-to-fine propagation / adaptive-aggregation blocks (TPU-native).

Re-designed from /root/reference/architectures/segmentor/blocks.py:49-354.
The reference builds these from raw F.conv2d calls with explicit nn.Parameter
kernels plus a *fixed* one-hot "mapping kernel" (k² filters of shape 1×k×k,
each selecting one neighborhood offset — an im2col in conv clothing,
blocks.py:66-83). Here the mapping conv is implemented as what it actually
is: a static pad + shifted-slice stack, which XLA lowers to pure data
movement instead of a 25-channel convolution.

Parity map:
  * clip_by_tensor            blocks.py:49-64   → clip_by_tensor
  * create_mapping_kernel     blocks.py:66-83   → extract_neighborhood (op)
  * basePC                    blocks.py:106-156 → BasePC
  * adaptive_aggregationPC    blocks.py:158-184 → AdaptiveAggregationPC
  * baseC                     blocks.py:187-238 → BaseC
  * adaptive_aggregationC     blocks.py:241-267 → AdaptiveAggregationC
  * baseMulti                 blocks.py:269-318 → BaseMulti
  * adaptive_aggregationMulti blocks.py:321-346 → AdaptiveAggregationMulti
  * GlobalAveragePooling2D    blocks.py:349-354 → global_average_pooling_2d
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from octave_tpu.models.resnest import Conv
from octave_tpu.ops.norm import BatchNorm


def clip_by_tensor(t: jax.Array, t_min, t_max) -> jax.Array:
    """Elementwise clip (blocks.py:49-64)."""
    t = t.astype(jnp.float32)
    return jnp.clip(t, t_min, t_max)


def extract_neighborhood(x: jax.Array, kernel_size: int) -> jax.Array:
    """The fixed one-hot 'mapping kernel' conv (blocks.py:66-83) as a
    shifted-slice stack.

    x: (b,h,w,1) → (b,h,w,k²) where out[..., h*k+w] is the input shifted by
    the (h,w) kernel offset, zero-padded at borders — exactly
    F.conv2d(x, one_hot_kernels, padding=k//2) channel ordering.
    """
    b, h, w, c = x.shape
    assert c == 1
    k = kernel_size
    p = k // 2
    # Conv correlation with a kernel that is 1 at (kh, kw):
    # out[i, j] = padded[i + kh, j + kw] over a (h+2p, w+2p) padded input.
    padded = jnp.pad(x[..., 0], ((0, 0), (p, p), (p, p)))
    slices = [
        padded[:, kh : kh + h, kw : kw + w]
        for kh in range(k)
        for kw in range(k)
    ]
    return jnp.stack(slices, axis=-1)


def _center_one_bias(channels: int):
    """conv7 bias init: zeros except center=1 (blocks.py:95-104)."""
    assert channels % 2 == 1

    def init(key, shape, dtype=jnp.float32):
        del key
        return jnp.zeros(shape, dtype).at[channels // 2].set(1.0)

    return init


def _normal_kernel(avg: float, std: float):
    """create_conv_kernel init: N(avg, std) (blocks.py:85-93)."""

    def init(key, shape, dtype=jnp.float32):
        return avg + std * jax.random.normal(key, shape, dtype)

    return init


class _PropagationBase(nn.Module):
    """Shared trunk of basePC/baseC/baseMulti: three full-pad convs with
    BN+ReLU, softmax over the pn² coefficient channels."""

    in_channels: int
    channels: int = 256
    pn_size: int = 5
    kernel_size: int = 3
    avg: float = 0.0
    std: float = 0.1
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, input_all: jax.Array, train: bool = False) -> jax.Array:
        k, p = self.kernel_size, self.kernel_size // 2
        init = _normal_kernel(self.avg, self.std)
        fm = Conv(self.channels, k, 1, p, use_bias=False, kernel_init=init, name="conv1")(input_all)
        fm = BatchNorm(self.channels, axis_name=self.bn_axis_name, name="bn1")(fm, train)
        fm = nn.relu(fm)
        fm = Conv(2 * self.channels, k, 1, p, use_bias=False, kernel_init=init, name="conv4")(fm)
        fm = BatchNorm(2 * self.channels, axis_name=self.bn_axis_name, name="bn4")(fm, train)
        fm = nn.relu(fm)
        n_out = self.pn_size * self.pn_size
        fm = Conv(
            n_out, k, 1, p, use_bias=True, kernel_init=init,
            bias_init=_center_one_bias(n_out), name="conv7",
        )(fm)
        fm = BatchNorm(n_out, axis_name=self.bn_axis_name, name="bn7")(fm, train)
        fm = nn.relu(fm)
        return jax.nn.softmax(fm, axis=-1)  # (b,h,w,pn²)


class BasePC(nn.Module):
    """src+thick+thin propagation basis (blocks.py:106-156)."""

    channels: int = 256
    pn_size: int = 5
    kernel_size: int = 3
    avg: float = 0.0
    std: float = 0.1
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, input_src, input_thick, input_thin, train: bool = False):
        input_all = jnp.concatenate((input_src, input_thick, input_thin), axis=-1)
        if input_all.shape[-1] != 3:
            raise ValueError(
                "Expect concatenated confidence map to have channel depth of 3. "
                f"Got {input_all.shape} instead."
            )
        return _PropagationBase(
            3, self.channels, self.pn_size, self.kernel_size, self.avg, self.std,
            self.bn_axis_name, name="base",
        )(input_all, train)


class AdaptiveAggregationPC(nn.Module):
    """max(thick, thin) neighborhood aggregation (blocks.py:158-184)."""

    pn_size: int = 5

    def __call__(self, input_thick, input_thin, agg_coeff):
        assert input_thick.shape[-1] == 1 and input_thin.shape[-1] == 1
        input_sal = jnp.maximum(input_thick, input_thin)
        map_sal = extract_neighborhood(input_sal, self.pn_size)
        assert agg_coeff.shape == map_sal.shape
        return jnp.sum(map_sal * agg_coeff, axis=-1, keepdims=True)


class BaseC(nn.Module):
    """src+thin propagation basis (blocks.py:187-238)."""

    channels: int = 256
    pn_size: int = 5
    kernel_size: int = 3
    avg: float = 0.0
    std: float = 0.1
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, input_src, input_thin, train: bool = False):
        input_all = jnp.concatenate((input_src, input_thin), axis=-1)
        if input_all.shape[-1] != 2:
            raise ValueError(
                "Expect concatenated confidence map to have channel depth of 3. "
                f"Got {input_all.shape} instead."
            )
        return _PropagationBase(
            2, self.channels, self.pn_size, self.kernel_size, self.avg, self.std,
            self.bn_axis_name, name="base",
        )(input_all, train)


class AdaptiveAggregationC(nn.Module):
    """thin-only aggregation (blocks.py:241-267)."""

    pn_size: int = 5

    def __call__(self, input_thin, agg_coeff):
        assert input_thin.shape[-1] == 1
        map_sal = extract_neighborhood(input_thin, self.pn_size)
        assert agg_coeff.shape == map_sal.shape
        return jnp.sum(map_sal * agg_coeff, axis=-1, keepdims=True)


class BaseMulti(nn.Module):
    """n-channel generalization (blocks.py:269-318)."""

    in_channels: int = 3
    channels: int = 256
    pn_size: int = 5
    kernel_size: int = 3
    avg: float = 0.0
    std: float = 0.1
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, basis: Sequence[jax.Array], train: bool = False):
        input_all = jnp.concatenate(list(basis)[: self.in_channels], axis=-1)
        assert input_all.shape[-1] == self.in_channels, (
            f"Expect the input to had {self.in_channels} channels, "
            f"got {input_all.shape[-1]} instead."
        )
        return _PropagationBase(
            self.in_channels, self.channels, self.pn_size, self.kernel_size,
            self.avg, self.std, self.bn_axis_name, name="base",
        )(input_all, train)


class AdaptiveAggregationMulti(nn.Module):
    """max-prob-map aggregation (blocks.py:321-346)."""

    pn_size: int = 5

    def __call__(self, max_prob_input, agg_coeff):
        assert max_prob_input.shape[-1] == 1
        map_sal = extract_neighborhood(max_prob_input, self.pn_size)
        assert agg_coeff.shape == map_sal.shape
        return jnp.sum(map_sal * agg_coeff, axis=-1, keepdims=True)


def global_average_pooling_2d(x: jax.Array) -> jax.Array:
    """GlobalAveragePooling2D (blocks.py:349-354): mean over spatial dims."""
    return jnp.mean(x, axis=(1, 2))
