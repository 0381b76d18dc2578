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
import threading
from typing import Callable, Dict, Iterable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


class PackedScale(NamedTuple):
    """A pre-packed quantization entry (offline weight quantization): the
    static activation scale plus the per-out-channel weight scales of the
    already-int8 kernel sitting in the params tree. Produced by
    `prepack_weights`; consumed transparently by `int8_conv` /
    `int8_conv_transpose_2x2` (they skip the per-call weight-quantize pass
    when the kernel argument is already int8)."""

    x_scale: float
    w_scale: np.ndarray  # (C_out,)


class _QuantSwitch(threading.local):
    """Trace-time switches. ``calibrating`` makes wrapped convs record input
    absmax into the mutable ``quant_stats`` collection; ``scales`` (a
    path->scale dict) makes convs whose path is present run int8.

    Thread-LOCAL (like the repo's other trace-time switches,
    ``folded_inference`` / ``groups_as_dense``): two differently configured
    Predictors can trace concurrently from different threads without
    capturing each other's contexts (VERDICT r3 item 9). The context
    managers must wrap the trace on the SAME thread that calls jit."""

    def __init__(self):
        self.calibrating = False
        self.scales: Optional[Dict[str, float]] = None


_Quant = _QuantSwitch()


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
    channel weight scales (from the live kernel, or pre-packed offline when
    `x_scale` is a PackedScale and `kernel` is already int8), int32 MXU
    accumulation, fused dequant + bias. NHWC/HWIO. Returns x.dtype."""
    packed_ws = None
    if isinstance(x_scale, PackedScale):
        packed_ws = x_scale.w_scale
        x_scale = x_scale.x_scale
    sx = jnp.float32(max(float(x_scale), 1e-12))
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127.0, 127.0).astype(jnp.int8)
    if kernel.dtype == jnp.int8:
        # offline-packed weights: no per-call quantize pass
        wq = kernel
        ws = jnp.asarray(packed_ws, jnp.float32)
    else:
        kf = kernel.astype(jnp.float32)
        ws = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)), 1e-12) / 127.0
        # explicit reciprocal-multiply (not division): XLA rewrites broadcast
        # division this way anyway, and spelling it out keeps the offline
        # prepack_weights path BIT-identical to this per-call path
        wq = jnp.round(kf * (1.0 / ws)).astype(jnp.int8)  # |w|/ws <= 127
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
    packed_ws = None
    if isinstance(x_scale, PackedScale):
        packed_ws = x_scale.w_scale
        x_scale = x_scale.x_scale
    sx = jnp.float32(max(float(x_scale), 1e-12))
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127.0, 127.0).astype(jnp.int8)
    if kernel.dtype == jnp.int8:
        wq = kernel
        ws = jnp.asarray(packed_ws, jnp.float32)
    else:
        kf = kernel.astype(jnp.float32)
        ws = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 2, 3)), 1e-12) / 127.0
        wq = jnp.round(kf * (1.0 / ws)[None, :, None, None]).astype(jnp.int8)
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
    return jnp.round(kf * (1.0 / ws)).astype(jnp.int8), ws


def prepack_weights(variables: dict, scales: Dict[str, float]):
    """Offline int8 weight packing (VERDICT r2 item 3 / ROADMAP r3): for
    every conv selected by `scales`, quantize its kernel ONCE here and store
    the int8 kernel in the params tree + the per-out-channel weight scales
    in a PackedScale entry — deleting the per-call weight-quantize pass from
    the serving graph (ops/quant.py:110-112 in r2 re-quantized the live
    kernel on every call).

    Returns (variables', scales'). The packed int8 kernels are BIT-identical
    to what the per-call path quantizes (same jax expression on the same
    folded bf16 kernels); end-to-end bf16 outputs agree to bf16 rounding
    (constant-folding the dequant multiplies reorders bf16 math) with
    identical masks — tests/test_quant.py::TestPrepack.

    Scale-key → kernel-path mapping (see the recording call sites):
      <conv module>/in_absmax          → <conv module>/conv/kernel  (HWIO)
      <upsampling module>/in_absmax    → <module>/kernel  ((I,O,2,2) layout)
      <decoder>/<name>_{a,b}_absmax    → <decoder>/<name>/conv/kernel
                                         (split-kernel pair: one shared
                                         kernel, per-out-channel scales are
                                         slice-invariant)
    """
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = dict(flatten_dict(variables["params"], sep="/"))
    new_scales: Dict[str, object] = {}
    packed: Dict[str, np.ndarray] = {}  # kernel path -> ws
    for key, val in scales.items():
        if isinstance(val, PackedScale):
            new_scales[key] = val
            continue
        mod, leaf = key.rsplit("/", 1)
        if leaf == "in_absmax":
            cands = [(f"{mod}/conv/kernel", (0, 1, 2)), (f"{mod}/kernel", (0, 2, 3))]
        elif leaf.endswith(("_a_absmax", "_b_absmax")):
            name = leaf[: -len("_a_absmax")]
            cands = [(f"{mod}/{name}/conv/kernel", (0, 1, 2))]
        else:
            cands = []
        hit = next(((p, ax) for p, ax in cands if p in flat), None)
        if hit is None:
            new_scales[key] = val  # no kernel found — keep per-call behavior
            continue
        path, axes = hit
        if path not in packed:
            # quantize with the SAME jax expression the per-call path
            # traces (quantize_weight), so wq/ws are bit-identical to what
            # the r2 serving graph computed every call
            kernel = flat[path]
            if axes == (0, 2, 3):  # conv-transpose (I, O, kh, kw) layout
                wq, ws = jax.jit(
                    lambda k: quantize_weight(jnp.transpose(k, (2, 3, 0, 1)))
                )(kernel)
                wq = jnp.transpose(wq, (2, 3, 0, 1))
            else:
                wq, ws = jax.jit(quantize_weight)(kernel)
            flat[path] = np.asarray(wq)
            packed[path] = np.asarray(ws)
        new_scales[key] = PackedScale(float(val), packed[path])
    out = dict(variables)
    out["params"] = unflatten_dict(flat, sep="/")
    return out, new_scales


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
