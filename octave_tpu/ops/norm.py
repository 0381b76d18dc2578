"""Batch normalization with PyTorch-compatible semantics, TPU-native sync.

torch BatchNorm2d (the reference's only norm layer, e.g.
/root/reference/architectures/extra/resnest.py:3) differs from
flax.linen.BatchNorm in two ways we care about:
  * running stats update uses the *unbiased* batch variance
    (new = (1 - m) * old + m * batch_stat, torch momentum m = 0.1), while the
    normalization itself uses the biased variance;
  * defaults: eps=1e-5, momentum=0.1.

Cross-replica ("sync BN") is the idiomatic multi-chip generalization the
ResNeSt docstring itself name-drops
(/root/reference/architectures/extra/resnest.py:291-292): pass ``axis_name``
when the module runs inside shard_map/pmap over a data mesh and the batch
statistics are pmean'd over ICI.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax


class BatchNorm(nn.Module):
    """NHWC batch norm over axis (0, 1, 2) with torch update semantics."""

    features: int
    epsilon: float = 1e-5
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    use_scale: bool = True
    use_bias: bool = True
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        scale = (
            self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
            if self.use_scale
            else None
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )

        if train:
            # accumulate statistics in at-least-f32 (bf16 inputs upcast;
            # f64 preserved for numerical testing)
            xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
            mean = jnp.mean(xf, axis=(0, 1, 2))
            mean2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
            n = x.shape[0] * x.shape[1] * x.shape[2]
            if self.axis_name is not None:
                mean = lax.pmean(mean, self.axis_name)
                mean2 = lax.pmean(mean2, self.axis_name)
                n = n * lax.psum(1, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean = ra_mean.value
            var = ra_var.value

        y = (x - mean.astype(x.dtype)) * lax.rsqrt(var + self.epsilon).astype(x.dtype)
        if scale is not None:
            y = y * scale.astype(x.dtype)
        if bias is not None:
            y = y + bias.astype(x.dtype)
        return y
