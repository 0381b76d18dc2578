"""Post-training int8 quantization (PTQ) for the decoder serving path.

The v5e profile (docs/architecture.md, "Where the time goes") shows the
decoder stages are bandwidth-bound: the convs themselves run at 81% MFU but
the stage time is dominated by HBM traffic on up-to-1.5 GB activation
tensors. int8 activations halve that floor vs bf16 (and quarter it vs f32),
and the MXU runs int8xint8->int32 at 2x the bf16 rate — both levers in one.

Design (mirrors the repo's other trace-time switches, ops/norm.py
``folded_inference`` / models/resnest.py ``groups_as_dense``):

  * **Calibration**: run eval batches under ``calibration()`` with
    ``mutable=["quant_stats"]``; every wrapped conv records the running
    absmax of its input into the ``quant_stats`` collection (keyed by module
    path). ``calibrate()`` drives this and merges maxima across batches.
  * **Scales**: ``scales_from_stats()`` flattens the collection into
    ``{"decoder_0/conv1/in_absmax": absmax/127, ...}`` with an include
    filter, so only the chosen subgraph (the decoder by default) quantizes.
  * **Serving**: under ``quantized_inference(scales)``, a wrapped conv whose
    path has a scale runs ``int8_conv``: symmetric per-tensor activation
    quantization (static scale -> XLA constant, the quantize fuses into the
    producer's epilogue so the producer *writes int8*), symmetric
    per-output-channel weight quantization computed from the live bf16/f32
    kernel argument (one tiny pass over weights, amortized over the batch),
    int8 conv with int32 accumulation on the MXU, fused dequant + bias
    epilogue.

The parameter tree is identical with or without quantization — checkpoints,
converters, and the torch parity tests are oblivious (the reference has no
quantized path; this is framework-supplied serving machinery, like
serve.py's wire formats).
"""
from __future__ import annotations

import contextlib
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
from jax import lax


class _Quant:
    """Trace-time switches. ``calibrating`` makes wrapped convs record input
    absmax into the mutable ``quant_stats`` collection; ``scales`` (a
    path->scale dict) makes convs whose path is present run int8."""

    calibrating = False
    scales: Optional[Dict[str, float]] = None


@contextlib.contextmanager
def calibration():
    prev = _Quant.calibrating
    _Quant.calibrating = True
    try:
        yield
    finally:
        _Quant.calibrating = prev


@contextlib.contextmanager
def quantized_inference(scales: Dict[str, float]):
    prev = _Quant.scales
    _Quant.scales = scales
    try:
        yield
    finally:
        _Quant.scales = prev


def _module_key(mod, leaf: str) -> str:
    return "/".join(str(p) for p in mod.scope.path) + "/" + leaf


def record_absmax(mod, x: jax.Array, leaf: str = "in_absmax") -> None:
    """Record the running absmax of `x` on `mod` (calibration mode only).
    Call from inside a module's __call__; a no-op unless calibrating."""
    if not _Quant.calibrating:
        return
    v = mod.variable("quant_stats", leaf, lambda: jnp.zeros((), jnp.float32))
    if not mod.is_initializing():
        v.value = jnp.maximum(v.value, jnp.max(jnp.abs(x)).astype(jnp.float32))


def scale_for(mod, leaf: str = "in_absmax") -> Optional[float]:
    """The static activation scale for this module's input, or None when
    quantized inference is off / this path was not selected."""
    if _Quant.scales is None:
        return None
    return _Quant.scales.get(_module_key(mod, leaf))


def int8_conv(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array],
    x_scale: float,
    *,
    strides=(1, 1),
    padding=((0, 0), (0, 0)),
    dilation=(1, 1),
    groups: int = 1,
) -> jax.Array:
    """Symmetric int8 conv: per-tensor activation scale (static), per-output-
    channel weight scales (from the live kernel), int32 MXU accumulation,
    fused dequant + bias. NHWC/HWIO. Returns x.dtype."""
    sx = jnp.float32(max(float(x_scale), 1e-12))
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127.0, 127.0).astype(jnp.int8)
    kf = kernel.astype(jnp.float32)
    ws = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)), 1e-12) / 127.0
    wq = jnp.round(kf / ws).astype(jnp.int8)  # |w|/ws <= 127 by construction
    y = lax.conv_general_dilated(
        xq,
        wq,
        window_strides=strides,
        padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (sx * ws)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def int8_conv_transpose_2x2(
    x: jax.Array, kernel: jax.Array, bias: Optional[jax.Array], x_scale: float
) -> jax.Array:
    """int8 version of ops.common.conv_transpose_2x2 (the Upsampling
    lowering): one int8 MXU matmul with int32 accumulation, per-out-channel
    weight scales, fused dequant + bias. `kernel` layout (C_in, C_out, 2, 2)
    (torch ConvTranspose2d layout)."""
    from octave_tpu.ops import common

    b, h, w, cin = x.shape
    cout = kernel.shape[1]
    sx = jnp.float32(max(float(x_scale), 1e-12))
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127.0, 127.0).astype(jnp.int8)
    kf = kernel.astype(jnp.float32)
    ws = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 2, 3)), 1e-12) / 127.0
    wq = jnp.round(kf / ws[None, :, None, None]).astype(jnp.int8)
    if common._CONV_TRANSPOSE_IMPL == "native":
        # same lowering as the bf16 path: spatially flipped HWIO kernel,
        # strided output written directly (no interleave reshape)
        wk = jnp.transpose(wq[:, :, ::-1, ::-1], (2, 3, 0, 1))
        y = lax.conv_transpose(
            xq, wk, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (sx * ws)
    else:
        y = jnp.einsum("bhwc,coij->bhiwjo", xq, wq, preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (sx * ws)  # ws broadcasts over the o dim
        y = y.reshape(b, 2 * h, 2 * w, cout)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def quantize_weight(kernel: jax.Array):
    """(wq int8, ws f32 per-out-channel) for an HWIO kernel — exposed for
    tests and offline weight packing."""
    kf = kernel.astype(jnp.float32)
    ws = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)), 1e-12) / 127.0
    return jnp.round(kf / ws).astype(jnp.int8), ws


def calibrate(apply_fn: Callable, variables, batches: Iterable) -> dict:
    """Run `apply_fn(variables, batch, mutable=["quant_stats"])` over the
    calibration batches under `calibration()`, merging absmax across batches.
    Returns the final quant_stats collection (a nested dict).

    `apply_fn` must forward `mutable` to module.apply and return
    `(outputs, mutated)`."""
    stats: dict = {}
    for batch in batches:
        vs = dict(variables)
        if stats:
            vs["quant_stats"] = stats
        with calibration():
            _, mut = apply_fn(vs, batch, mutable=["quant_stats"])
        stats = mut["quant_stats"]
    return jax.tree.map(lambda v: jax.device_get(v), stats)


def scales_from_stats(
    stats: dict,
    include: Optional[Callable[[str], bool]] = None,
) -> Dict[str, float]:
    """Flatten a quant_stats collection into {path: activation_scale}.
    `include` filters by path string (default: decoder blocks of
    ResnestUNet — the bandwidth-bound stages per the v5e profile).

    The default deliberately EXCLUDES the Upsampling einsums: quantizing
    them was measured 9% slower end-to-end on v5e (int8 dot output layout
    forces a transpose copy where the bf16 einsum's block-interleaved
    reshape is a free view — benchmarks/int8_ab.json) and excludes the
    encoder (int8 grouped SplAt convs lower below bf16 rate, scope=all
    measured 3% slower than decoder-only)."""
    from flax.traverse_util import flatten_dict

    if include is None:
        include = lambda p: p.startswith("decoder_")
    out = {}
    for path, v in flatten_dict(stats).items():
        key = "/".join(str(p) for p in path)
        a = float(v)
        if a > 0.0 and include(key):
            out[key] = a / 127.0
    return out
