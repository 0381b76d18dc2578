"""Same-padding calculators and the uniform scalar helper — API parity with
/root/reference/architectures/utils.py:8-22 (unused by the reference's main
path but part of its public surface)."""
from __future__ import annotations

import math
import jax
import jax.numpy as jnp


def get_same_padding_conv(input_size: int, kernel_size: int, stride: int) -> int:
    """Padding so n_out == n_in for a square conv (utils.py:8-13)."""
    padding_size = ((stride * (input_size - 1)) - input_size + kernel_size) / 2
    return math.ceil(padding_size)


def get_same_padding_transpose(input_size: int, kernel_size: int, stride: int) -> int:
    """Transpose-conv same-padding (utils.py:16-18; reference formula kept
    verbatim, including its // 2 floor)."""
    padding_size = (stride - (input_size * (1 - stride)) + kernel_size) // 2
    return padding_size


def rand_uniform(key: jax.Array, dtype=jnp.float32) -> jax.Array:
    """One U(0,1) scalar (utils.py:20-22) — explicit-PRNG JAX equivalent of
    the reference's torch.FloatTensor(1).uniform_(0, 1)."""
    return jax.random.uniform(key, (), dtype)
