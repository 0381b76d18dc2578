"""Inference serving: a double-buffered predictor that overlaps host IO with
device compute.

The framework's production inference path (BASELINE.json north star: ≥5k
304² images/sec on v5e-8). Design:
  * bf16 weights/activations (MXU-native),
  * params passed as jit arguments (small HLO, relay-friendly),
  * asynchronous dispatch pipelining — the host enqueues batch i+1 while the
    device runs batch i, hiding per-call dispatch latency behind device time,
  * optional data-parallel fan-out over a device mesh.
"""
from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from octave_tpu.models.segmentor import ResnestUNet


class Predictor:
    """Batched OCTA vessel predictor around ResnestUNet.predict."""

    def __init__(
        self,
        variables,
        num_classes: int = 2,
        method: str = "softmax",
        dtype=jnp.bfloat16,
        use_pallas_aag: bool = False,
        use_fused_decoder: bool = False,
        fold_bn: bool = True,
        output_format: str = "prob_f32",  # 'prob_f32' | 'prob_f16' | 'mask_u8'
        mesh=None,
        int8_decoder: bool = False,
        calibration_batches=None,
        int8_scope: str = "decoder",  # 'decoder' | 'decoder+ups' | 'dense' | 'all'
        dense_groups=None,  # None | 'decoder' | 'all': lower grouped convs dense
        int8_prepack: bool = True,  # offline weight quantization (exact)
    ):
        """int8_decoder: PTQ the bandwidth-bound decoder stages to int8
        activations/weights (ops/quant.py). Requires `calibration_batches`
        (an iterable of input batches, uint8 or float [0,1]) to set the
        static activation scales; 1-4 representative batches suffice.
        int8_scope='all' additionally quantizes the encoder convs — more
        throughput, slightly larger accuracy shift; check with
        benchmarks/int8_accuracy.py before serving. dense_groups='decoder'
        lowers the decoder splat grouped convs as block-diagonal dense
        (exact math; see models/resnest.py::groups_as_dense)."""
        self.model = ResnestUNet(
            num_classes=num_classes,
            use_pallas_aag=use_pallas_aag,
            use_fused_decoder=use_fused_decoder,
        )
        self.method = method
        self.dtype = dtype
        self._fold_bn = fold_bn
        self._dense_groups = dense_groups
        if fold_bn:
            from octave_tpu.ops.norm import fold_batch_stats

            variables = fold_batch_stats(variables)
        if dtype == jnp.bfloat16:
            variables = jax.tree.map(
                lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
                variables,
            )
        self.variables = variables
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._batch_sharding = NamedSharding(mesh, P("data"))
            self.variables = jax.tree.map(
                lambda x: jax.device_put(x, NamedSharding(mesh, P())), self.variables
            )

        self._quant_scales = None
        if int8_decoder:
            if calibration_batches is None:
                raise ValueError(
                    "int8_decoder=True requires calibration_batches "
                    "(a few representative input batches)"
                )
            self._quant_scales = self._calibrate(calibration_batches, int8_scope)
            if int8_prepack:
                # offline weight quantization: int8 kernels live in the
                # params tree, deleting the per-call weight-quantize pass
                # (bit-identical outputs — ops/quant.py::prepack_weights)
                from octave_tpu.ops.quant import prepack_weights

                self.variables, self._quant_scales = prepack_weights(
                    self.variables, self._quant_scales
                )
                # prepack_weights returns the packed kernels as HOST numpy
                # arrays; params ride every jitted call as arguments, so
                # host leaves would re-upload ~70 MB over the relay link on
                # EACH call (measured 3.4 s/call, benchmarks/serve_latency
                # .json pre-fix). Commit the tree to device once here.
                if mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    self.variables = jax.tree.map(
                        lambda x: jax.device_put(x, NamedSharding(mesh, P())),
                        self.variables,
                    )
                else:
                    self.variables = jax.device_put(self.variables)

        def fwd(params, image):
            if jnp.issubdtype(image.dtype, jnp.integer):
                # uint8 wire format: 4x smaller host->device uploads; the
                # [0,1] normalization happens on device
                image = image.astype(dtype) / jnp.asarray(255.0, dtype)
            _, pred = self.model.apply(
                params, image.astype(dtype), method, False,
                method=ResnestUNet.predict,
            )
            # compact device->host wire formats (the relay downlink is slow)
            if output_format == "mask_u8":
                vessel = pred[..., 1] if pred.shape[-1] > 1 else pred[..., 0]
                return (vessel >= 0.5).astype(jnp.uint8) * jnp.uint8(255)
            if output_format == "prob_f16":
                return pred.astype(jnp.float16)
            return pred.astype(jnp.float32)

        self._raw_fwd = fwd
        jitted = jax.jit(fwd)

        def call(params, image):
            # the trace contexts only affect tracing; cached execs are free
            with self._trace_ctx():
                return jitted(params, image)

        self._fn = call
        self._scan_jitted = None

    def _trace_ctx(self):
        """Context managers active while the serving graph traces (folded-BN
        affine reads, int8 decoder). No-ops on cached executions."""
        import contextlib

        st = contextlib.ExitStack()
        if self._fold_bn:
            from octave_tpu.ops.norm import folded_inference

            st.enter_context(folded_inference())
        if self._quant_scales is not None:
            from octave_tpu.ops import quant

            st.enter_context(quant.quantized_inference(self._quant_scales))
        if self._dense_groups is not None:
            from octave_tpu.models.resnest import groups_as_dense

            include = (None if self._dense_groups == "all"
                       else lambda p: p.startswith("decoder_"))
            st.enter_context(groups_as_dense(include))
        return st

    def _calibrate(self, batches, scope: str = "decoder") -> dict:
        """Collect decoder activation scales (ops/quant.py) by running the
        calibration batches through the same (folded, bf16) eval graph."""
        from octave_tpu.ops import quant
        from octave_tpu.ops.norm import folded_inference

        import contextlib

        @jax.jit
        def step(vs, image):
            if jnp.issubdtype(image.dtype, jnp.integer):
                image = image.astype(self.dtype) / jnp.asarray(255.0, self.dtype)
            _, mut = self.model.apply(
                vs, image.astype(self.dtype), False, mutable=["quant_stats"]
            )
            return mut["quant_stats"]

        def apply_fn(vs, batch, mutable):
            with contextlib.ExitStack() as st:
                if self._fold_bn:
                    st.enter_context(folded_inference())
                return None, {"quant_stats": step(vs, self._put(batch))}

        stats = quant.calibrate(apply_fn, self.variables, batches)
        includes = {
            "all": lambda p: True,
            # decoder + the encoder's DENSE convs (stem, bottleneck
            # conv1/conv3/downsample); the grouped SplAt conv2 stays bf16
            # (its int8 lowering measured below bf16 rate on v5e)
            "dense": lambda p: p.startswith("decoder_")
            or (p.startswith("backbone") and "/conv2/" not in p),
            "decoder+ups": lambda p: p.startswith(("decoder_", "upsampling_")),
            "decoder": None,
        }
        if scope not in includes:
            raise ValueError(
                f"unknown int8_scope {scope!r}; expected one of "
                f"{sorted(includes)}"
            )
        return quant.scales_from_stats(stats, include=includes[scope])

    @classmethod
    def initialize(cls, image_hw: Tuple[int, int] = (304, 304), seed: int = 0, **kw):
        """Fresh (random-weight) predictor — weights usually come from a
        checkpoint (orbax) or the torch converter instead."""
        model = ResnestUNet(num_classes=kw.get("num_classes", 2))
        x = jnp.zeros((1, *image_hw, 3), jnp.float32)
        variables = jax.jit(model.init, static_argnums=(2,))(
            jax.random.PRNGKey(seed), x, False
        )
        return cls(variables, **kw)

    def _put(self, batch: np.ndarray) -> jax.Array:
        # keep uint8 on the wire (normalize on device); floats cast to the
        # compute dtype before upload (half the bytes of float32)
        x = jnp.asarray(batch) if batch.dtype == np.uint8 else jnp.asarray(batch, self.dtype)
        if self.mesh is not None:
            x = jax.device_put(x, self._batch_sharding)
        return x

    def __call__(self, batch: np.ndarray) -> np.ndarray:
        """Synchronous single-batch prediction (b,h,w,3) → (b,h,w,c)."""
        return np.asarray(self._fn(self.variables, self._put(batch)))

    def predict_many(self, stack: np.ndarray) -> np.ndarray:
        """Aggregated dispatch: run a (k, b, h, w, 3) stack of batches in ONE
        device dispatch. Amortizes per-dispatch host overhead (~28 ms on the
        relay link) over k batches while HBM peaks near one batch's
        activations (the k forwards are data-independent but XLA serializes
        them, reusing buffers) — the throughput-serving counterpart of
        predict_stream's latency pipelining.

        The k forwards are UNROLLED in the traced graph, not lax.scan'd:
        XLA pins conservative layouts inside loop bodies, measured 10x
        slower for this conv-heavy body on v5e (benchmarks/int8_ab.json,
        scan4 83 vs per-call 804 img/s). An optimization_barrier chains
        forward i+1's input on forward i's output — without it the
        latency-hiding scheduler interleaves the k forwards and HBM peaks
        at kx one batch's activations (measured OOM at k=3, B=256).
        Compile time grows with k — keep k small (2-6) and fixed."""
        return np.asarray(self.predict_many_device(stack))

    def predict_many_device(self, stack: np.ndarray) -> jax.Array:
        """predict_many without the device->host transfer — returns the
        (k, b, ...) device array (for on-device postprocessing or metrics)."""
        if self._scan_jitted is None:

            def fwd_k(params, xs):
                outs = []
                for i in range(xs.shape[0]):
                    xi = xs[i]
                    if outs:
                        # serialize: batch i+1 may not start before batch i
                        # finishes, so activation buffers are reused
                        xi, _ = jax.lax.optimization_barrier((xi, outs[-1]))
                    outs.append(self._raw_fwd(params, xi))
                return jnp.stack(outs)

            self._scan_jitted = jax.jit(fwd_k)

        x = (
            jnp.asarray(stack)
            if stack.dtype == np.uint8
            else jnp.asarray(stack, self.dtype)
        )
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            x = jax.device_put(x, NamedSharding(self.mesh, P(None, "data")))
        with self._trace_ctx():
            return self._scan_jitted(self.variables, x)

    def predict_stream(
        self, batches: Iterable[np.ndarray], depth: int = 2
    ) -> Iterator[np.ndarray]:
        """Pipelined prediction over a batch stream.

        Keeps up to `depth` dispatches in flight: the device executes batch i
        while the host uploads i+1 and downloads i-1 — steady-state
        throughput approaches pure device time.
        """
        from collections import deque

        inflight: deque = deque()
        for batch in batches:
            # drain BEFORE dispatching so at most `depth` calls are ever in
            # flight (dispatch-then-drain briefly held depth+1)
            if len(inflight) >= depth:
                yield np.asarray(inflight.popleft())
            inflight.append(self._fn(self.variables, self._put(batch)))
        while inflight:
            yield np.asarray(inflight.popleft())
