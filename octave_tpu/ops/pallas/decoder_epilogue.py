"""Fused decoder-block epilogue (wired via ResnestUNet(use_fused_decoder=True)).

Profiling (docs/architecture.md §"Where the time goes") shows the decoder
blocks are bandwidth-bound BETWEEN convs: after the split-attention conv and
the shortcut conv, XLA runs the radix-softmax apply, inner ReLU, residual
affine + add, ReLU, and the AAG gate as several full passes over
(B,H,W,C)-sized tensors. This kernel does all of it in ONE VMEM-resident pass:

    inputs:  z    (B,H,W,2C)  split-attention conv output, post BN0+ReLU
             attn (B,2C)      fc2 logits (softmax over radix applied here)
             res  (B,H,W,C)   shortcut conv output (pre-BN)
             res_scale/bias (C,)   eval/folded shortcut-BN affine
             aag_w (C,K), aag_b (K)
    outputs: gated (B,H,W,C) = y * mask,  y_hat (B,H,W,K)
    where    s    = attn0*z[...,:C] + attn1*z[...,C:]      (radix=2 apply)
             y    = relu(relu(s) + res*res_scale + res_bias)
             y_hat= softmax(y·aag_w + aag_b);  mask = Σ_{k≥1} y_hat

(the inner relu(s) is the decoder's post-SplAt activation, reference
resnest.py:18-43; the outer relu joins the residual.)

Eval-only (no custom VJP; training uses the unfused path); grid over
(batch, row-tiles). Interpret mode covers CPU tests.
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


def _kernel(z_ref, attn_ref, res_ref, rs_ref, rb_ref, w_ref, b_ref,
            out_ref, yhat_ref, *, c: int, k: int):
    # All math in 2-D (rows, lanes) form — Mosaic's vector lowering covers
    # sublane broadcasts of (1, C) vectors and (rows, 1)*(rows, C) mask
    # multiplies (the 4-D formulation hit "Not implemented: Lane broadcast"
    # on v5e). Leading block dims collapse without moving the lane dim.
    sh4 = out_ref.shape  # (1, TH, W, C)
    z = z_ref[:].reshape(-1, 2 * c)     # (N, 2C)
    res = res_ref[:].reshape(-1, c)     # (N, C)
    bi = pl.program_id(0)
    attn = attn_ref[pl.ds(bi, 1), :]    # (1, 2C) — full (B,2C) resident
    rs = rs_ref[:]                      # (1, C)
    rb = rb_ref[:]                      # (1, C)
    w = w_ref[:]                        # (C, K_pad)
    b = b_ref[:]                        # (1, K_pad)

    # radix-2 softmax over (a0, a1) pairs per channel
    a0 = attn[:, :c]
    a1 = attn[:, c:]
    m = jnp.maximum(a0, a1)
    e0 = jnp.exp(a0 - m)
    e1 = jnp.exp(a1 - m)
    inv = 1.0 / (e0 + e1)
    p0 = (e0 * inv).astype(z.dtype)
    p1 = (e1 * inv).astype(z.dtype)

    s = z[:, :c] * p0 + z[:, c:] * p1
    # decoder block: relu(residual_affine + relu(splat_out))
    s = jnp.maximum(s, 0.0)
    y = jnp.maximum(
        s + res * rs.astype(res.dtype) + rb.astype(res.dtype), 0.0
    )

    # AAG: logits over classes via MXU, masked softmax over first k lanes
    logits = jnp.dot(y, w, preferred_element_type=jnp.float32) + b
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < k, logits, -jnp.inf)
    mx = jnp.max(logits, axis=-1, keepdims=True)
    ex = jnp.exp(logits - mx)
    yh = ex / jnp.sum(ex, axis=-1, keepdims=True)
    mask = jnp.sum(jnp.where(col >= 1, yh, 0.0), axis=-1, keepdims=True)

    out_ref[:] = (y * mask.astype(y.dtype)).reshape(sh4).astype(out_ref.dtype)
    # store only the k real class lanes: writing the 128-lane pad back to
    # HBM would be a 64x write amplification for num_classes=2
    kk = yhat_ref.shape[-1]
    yhat_ref[:] = yh[:, :kk].reshape(sh4[:-1] + (kk,)).astype(yhat_ref.dtype)


def fused_decoder_epilogue(
    z: jax.Array,
    attn_logits: jax.Array,
    res: jax.Array,
    res_scale: jax.Array,
    res_bias: jax.Array,
    aag_w: jax.Array,
    aag_b: jax.Array,
    interpret: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """See module docstring. z (B,H,W,2C); attn_logits (B,2C); res (B,H,W,C);
    returns (gated (B,H,W,C), y_hat (B,H,W,K))."""
    bsz, h, w_sp, c2 = z.shape
    c = c2 // 2
    k = aag_w.shape[1]
    k_pad = LANE

    # Row-tile height from a scoped-VMEM budget. Per pixel the kernel holds
    # z (2C) + res/out (2C) at the activation itemsize plus ~5 f32
    # (rows, 128)-lane temporaries for the masked softmax (logits/iota/exp/
    # sum/yhat) — those dominate at the decoder's narrow channel counts.
    # v5e scoped vmem limit is 16 MB; target well under half of it.
    isz = z.dtype.itemsize
    per_row = w_sp * (2 * c2 * isz + 5 * LANE * 4)
    th = max(1, min(h, (4 * 1024 * 1024) // max(1, per_row)))
    while h % th:
        th -= 1

    wp = jnp.pad(aag_w.astype(jnp.float32), ((0, 0), (0, k_pad - k)))
    bp = jnp.pad(aag_b.astype(jnp.float32).reshape(1, k), ((0, 0), (0, k_pad - k)))
    rs = res_scale.astype(jnp.float32).reshape(1, c)
    rb = res_bias.astype(jnp.float32).reshape(1, c)
    attn_logits = attn_logits.astype(jnp.float32)  # softmax in f32 (tiny)

    if interpret is None:
        interpret = not _on_tpu()

    out, yhat = pl.pallas_call(
        functools.partial(_kernel, c=c, k=k),
        grid=(bsz, h // th),
        in_specs=[
            pl.BlockSpec((1, th, w_sp, c2), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, c2), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w_sp, c), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, k_pad), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, th, w_sp, c), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w_sp, k), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, h, w_sp, c), z.dtype),
            jax.ShapeDtypeStruct((bsz, h, w_sp, k), z.dtype),
        ],
        interpret=interpret,
    )(z, attn_logits, res, rs, rb, wp, bp)

    return out, yhat
