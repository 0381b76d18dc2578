"""Multi-scale LS-GAN discriminator (Valvano design), TPU-native.

Re-designed from /root/reference/architectures/discriminator/blocks.py as NHWC
Flax modules with explicit PRNG plumbing (the two stochastic layers) and
spectral-norm power-iteration state in a mutable 'spectral' collection.

Parity map:
  * DiscriminatorBlock  blocks.py:12-133  → DiscriminatorBlock
  * InstanceNoise       blocks.py:135-154 → InstanceNoise
  * LabelNoise          blocks.py:156-185 → LabelNoise
  * spectral_norm(conv) blocks.py:104-107 → SpectralConv

Stochasticity contract (quirks preserved):
  * InstanceNoise draws ONE (H,W) noise map shared across batch and channels
    (blocks.py:150) and adds it only when training; the [0,1] clip applies in
    eval too (blocks.py:151-153).
  * LabelNoise draws ONE uniform scalar per forward (not per sample,
    blocks.py:165-170 + utils.py:20-22) and is NOT gated on training.
"""
from __future__ import annotations

from typing import Literal, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from octave_tpu.ops.common import (
    kaiming_normal_leaky,
    kaiming_uniform_torch,
    torch_conv_bias_init,
    xavier_uniform,
)


def _l2_normalize(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    return v / (jnp.linalg.norm(v) + eps)


class SpectralConv(nn.Module):
    """Conv2d wrapped in spectral normalization (1 power iteration/step).

    Mirrors torch.nn.utils.spectral_norm semantics: the weight matrix is the
    OIHW kernel flattened to (out, in*kh*kw); training updates (u, v) by one
    power iteration then sigma = u·W·v; eval reuses the stored vectors.
    State lives in the 'spectral' collection (u, v) so it checkpoints and
    shards like any other pytree leaf.
    """

    features: int
    kernel_size: int = 4
    strides: int = 2
    padding: int = 1
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        k = self.kernel_size
        in_ch = x.shape[-1]
        fan_in = in_ch * k * k
        kernel = self.param(
            "kernel", kaiming_uniform_torch(), (k, k, in_ch, self.features)
        )
        bias = self.param("bias", torch_conv_bias_init(fan_in), (self.features,))

        # torch layout: (out, in*kh*kw) with (in, kh, kw) C-order flatten
        w_mat = jnp.transpose(kernel, (3, 2, 0, 1)).reshape(self.features, -1)

        # torch inits u, v as normalized N(0,1) vectors
        u_var = self.variable(
            "spectral", "u",
            lambda: _l2_normalize(jax.random.normal(self.make_rng("params"), (self.features,))),
        )
        v_var = self.variable(
            "spectral", "v",
            lambda: _l2_normalize(jax.random.normal(self.make_rng("params"), (w_mat.shape[1],))),
        )

        u, v = u_var.value, v_var.value
        if train:
            v = _l2_normalize(w_mat.T @ u, self.eps)
            u = _l2_normalize(w_mat @ v, self.eps)
            # torch power-iterates under no_grad, so sigma's gradient flows
            # only through W, never through the freshly updated u/v
            # (torch spectral_norm._power_method; ADVICE r1).
            u = jax.lax.stop_gradient(u)
            v = jax.lax.stop_gradient(v)
            u_var.value = u
            v_var.value = v
        sigma = jnp.dot(u, w_mat @ v)
        # divide in sigma's (f32) precision, then match the input dtype so
        # the conv stays MXU-native under bf16 mixed precision (the u/v
        # power-iteration state is always f32; see train/steps.py _cast)
        kernel_sn = (kernel / sigma).astype(x.dtype)

        y = jax.lax.conv_general_dilated(
            x,
            kernel_sn,
            window_strides=(self.strides, self.strides),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias


class InstanceNoise(nn.Module):
    """Gaussian input noise (blocks.py:135-154)."""

    mean: float = 0.0
    std: float = 0.2
    clipping: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if train:
            # one (H, W) map shared across batch and channels (blocks.py:150)
            noise = self.mean + self.std * jax.random.normal(
                self.make_rng("noise"), (x.shape[1], x.shape[2]), x.dtype
            )
            out = x + noise[None, :, :, None]
        else:
            out = x
        if self.clipping:
            out = jnp.clip(out, 0.0, 1.0)
        return out


class LabelNoise(nn.Module):
    """Label-noise 'gradient reversal' (blocks.py:156-185): with prob p,
    flip the sign of (or invert) the logits. One scalar draw per forward."""

    prob: float = 0.1
    mode: Literal["sign", "label"] = "sign"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        rand = jax.random.uniform(self.make_rng("noise"), ())
        flip = rand < self.prob
        if self.mode == "sign":
            return jnp.where(flip, -x, x)
        if self.mode == "label":
            return jnp.where(flip, jnp.abs(1.0 - x), x)
        raise NotImplementedError


class DiscriminatorBlock(nn.Module):
    """Multi-scale critic over the finest-first mask/attention pyramid
    (blocks.py:12-133).

    input y: sequence of (b, h/2^i, w/2^i, num_classes) maps, finest first.
    Output: (b, 1) logits.

    `input_hw` is the full-resolution spatial size (static) — it fixes the
    final conv's kernel to (h/2^(depth+1), w/2^(depth+1)) exactly as the
    reference computes from input_shape (blocks.py:68).
    """

    input_hw: Tuple[int, int]
    depth: int = 3
    num_filters: int = 64
    instance_noise: bool = True
    label_noise: bool = True

    @nn.compact
    def __call__(self, y: Sequence[jax.Array], train: bool = False) -> jax.Array:
        nf = self.num_filters
        s = y[0]
        if self.instance_noise:
            s = InstanceNoise(mean=0.0, std=0.2, clipping=True, name="instance_noise")(s, train)
        # conv_0: k4 s2 p1, kaiming-leaky init (blocks.py:46-49)
        in_ch = s.shape[-1]
        s = nn.Conv(
            nf, (4, 4), (2, 2), [(1, 1), (1, 1)],
            kernel_init=kaiming_normal_leaky(negative_slope=0.0),
            bias_init=torch_conv_bias_init(in_ch * 16),
            name="conv_0",
        )(s)
        s = jax.nn.leaky_relu(s, negative_slope=0.2)

        for i in range(self.depth):
            squeeze_in = s.shape[-1]
            s = nn.Conv(
                13, (1, 1), (1, 1), "VALID",
                kernel_init=kaiming_uniform_torch(),
                bias_init=torch_conv_bias_init(squeeze_in),
                name=f"squeeze_{i}",
            )(s)
            s = jax.nn.sigmoid(s)
            s = jnp.concatenate((s, y[i + 1]), axis=-1)
            s = SpectralConv(
                nf * 2 * (2**i), kernel_size=4, strides=2, padding=1,
                name=f"spectral_{i}",
            )(s, train)
            s = jnp.tanh(s)

        h, w = (d // (2 ** (self.depth + 1)) for d in self.input_hw)
        fc_in = nf * (2**self.depth)
        logits = nn.Conv(
            1, (h, w), (1, 1), "VALID",
            kernel_init=xavier_uniform(),
            bias_init=torch_conv_bias_init(fc_in * h * w),
            name="out_conv",
        )(s)
        logits = logits.reshape(logits.shape[0], -1)
        if self.label_noise:
            logits = LabelNoise(prob=0.1, mode="sign", name="label_noise")(logits)
        return logits

    def predict(self, y: Sequence[jax.Array], train: bool = False) -> jax.Array:
        return self(y, train)
