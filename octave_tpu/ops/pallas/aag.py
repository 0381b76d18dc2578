"""Fused Adversarial Attention Gate as a Pallas TPU kernel.

The AAG (reference blocks.py:12-46) is 1x1-conv → per-pixel softmax over
classes → mask = sum of non-background probs → x * mask. Done naively that
is four HBM round trips over the (B,H,W,C) activation; fused, each x tile is
read once into VMEM, the class logits come from one small MXU matmul, and
both outputs (masked x, y_hat) are written straight back — one read + two
writes, the bandwidth floor for this op.

Grid: rows of the flattened (B*H*W, C) activation, TILE_N rows per program.
The class count K (=2 for OCTA) rides the lane dimension zero-padded to the
f32 tile width; the pad lanes are masked out of the softmax.

Forward-only kernel + jax.custom_vjp with a pure-XLA backward (the backward
is matmul-shaped and fuses well). Falls back to interpret mode off-TPU so
tests run on CPU.

Measured on v5e (batch 128, 304², full ResnestUNet): bit-exact vs the XLA
path but ~20% slower end-to-end — XLA already fuses the gate chain into its
producers, and the kernel's (512, C<128) tiles are lane-starved at the
decoder's narrow channel counts. Kept behind use_pallas_aag=False as the
Pallas reference implementation; revisit with channel-packed tiling if the
gate ever dominates a profile.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _kernel(x_ref, w_ref, b_ref, out_ref, yhat_ref, *, k: int):
    x = x_ref[:]  # (TILE_N, C)
    w = w_ref[:]  # (C, K_pad)
    b = b_ref[:]  # (1, K_pad)
    logits = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
    # softmax over the first k lanes only; pad lanes -> -inf
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    neg = jnp.full_like(logits, -jnp.inf)
    logits = jnp.where(col < k, logits, neg)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    yhat = e / jnp.sum(e, axis=-1, keepdims=True)
    # attention mask: classes 1..k-1 (background = class 0)
    mask = jnp.sum(jnp.where(col >= 1, yhat, 0.0), axis=-1, keepdims=True)
    out_ref[:] = (x * mask.astype(x.dtype)).astype(out_ref.dtype)
    yhat_ref[:] = yhat.astype(yhat_ref.dtype)


def _pad_lanes(a: jax.Array, width: int, axis: int) -> jax.Array:
    pad = width - a.shape[axis]
    if pad <= 0:
        return a
    cfg = [(0, 0)] * a.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(a, cfg)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_aag(x: jax.Array, w: jax.Array, b: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """x: (B,H,W,C); w: (C,K) 1x1-conv kernel; b: (K,).

    Returns (masked_x (B,H,W,C), y_hat (B,H,W,K))."""
    return _forward(x, w, b)


def _forward(x, w, b, interpret: bool | None = None):
    bsz, h, ww, c = x.shape
    k = w.shape[1]
    n = bsz * h * ww
    tile_n = 512
    n_pad = -(-n // tile_n) * tile_n
    k_pad = LANE

    xf = x.reshape(n, c)
    if n_pad != n:
        xf = jnp.pad(xf, ((0, n_pad - n), (0, 0)))
    wp = _pad_lanes(w.astype(jnp.float32), k_pad, 1)
    bp = _pad_lanes(b.astype(jnp.float32).reshape(1, k), k_pad, 1)

    if interpret is None:
        interpret = not _on_tpu()

    out, yhat = pl.pallas_call(
        functools.partial(_kernel, k=k),
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, k_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, c), x.dtype),
            jax.ShapeDtypeStruct((n_pad, k_pad), x.dtype),
        ],
        interpret=interpret,
    )(xf, wp, bp)

    out = out[:n].reshape(bsz, h, ww, c)
    yhat = yhat[:n, :k].reshape(bsz, h, ww, k)
    return out, yhat


def _fwd(x, w, b):
    out, yhat = _forward(x, w, b)
    return (out, yhat), (x, w, yhat)


def _bwd(res, grads):
    """Pure-XLA backward (matmul-shaped; fuses fine)."""
    x, w, yhat = res
    g_out, g_yhat = grads
    mask = jnp.sum(yhat[..., 1:], axis=-1, keepdims=True)
    dmask = jnp.sum(g_out * x, axis=-1, keepdims=True)  # (B,H,W,1)
    k = yhat.shape[-1]
    sel = jnp.concatenate(
        [jnp.zeros((1,), x.dtype), jnp.ones((k - 1,), x.dtype)]
    )
    ghat = g_yhat + dmask * sel  # dL/d y_hat total
    # softmax vjp: g_z = yhat * (ghat - sum(ghat * yhat))
    g_z = yhat * (ghat - jnp.sum(ghat * yhat, axis=-1, keepdims=True))
    g_x = g_out * mask + jnp.einsum("bhwk,ck->bhwc", g_z, w)
    g_w = jnp.einsum("bhwc,bhwk->ck", x, g_z)
    g_b = jnp.sum(g_z, axis=(0, 1, 2))
    return g_x, g_w, g_b


fused_aag.defvjp(_fwd, _bwd)
