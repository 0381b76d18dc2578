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

import queue
import threading
from concurrent.futures import Future
from typing import Iterable, Iterator, Sequence, Tuple

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
        dense_groups=None,  # None|'decoder'|'decoder:<digits>'|'all': grouped convs -> dense
        einsum_groups=None,  # same grammar (+ 'enc'): grouped convs -> shifted batched matmuls
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
        # cheap argument validation first — before any model build / BN fold
        # (callers shouldn't pay a full init to learn a kwarg is missing)
        if int8_decoder and calibration_batches is None:
            raise ValueError(
                "int8_decoder=True requires calibration_batches "
                "(a few representative input batches)"
            )
        self.model = ResnestUNet(
            num_classes=num_classes,
            use_pallas_aag=use_pallas_aag,
            use_fused_decoder=use_fused_decoder,
        )
        self.method = method
        self.dtype = dtype
        self._fold_bn = fold_bn
        self._dense_groups = dense_groups
        self._einsum_groups = einsum_groups
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

        self._quant_scales = None
        if int8_decoder:
            self._quant_scales = self._calibrate(calibration_batches, int8_scope)
            if int8_prepack:
                # offline weight quantization: int8 kernels live in the
                # params tree, deleting the per-call weight-quantize pass
                # (bit-identical outputs — ops/quant.py::prepack_weights)
                from octave_tpu.ops.quant import prepack_weights

                self.variables, self._quant_scales = prepack_weights(
                    self.variables, self._quant_scales
                )

        # Commit the weights to device ONCE regardless of source: loaders
        # (orbax, weights304.npz, torch converter) hand back host numpy
        # leaves, and params ride every jitted call as arguments — host
        # leaves would re-upload ~143 MB over the relay on EACH call
        # (measured 2.8 s/call for the bf16 path, serve_latency.json
        # round-4 pre-fix rows). Under a mesh, commit replicated so the
        # non-prepacked paths don't hit the same per-call re-upload.
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            replicated = NamedSharding(mesh, P())
            self.variables = jax.tree.map(
                lambda x: jax.device_put(x, replicated), self.variables
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
            from octave_tpu.models.resnest import (dense_groups_include,
                                                   groups_as_dense)

            st.enter_context(
                groups_as_dense(dense_groups_include(self._dense_groups)))
        if self._einsum_groups is not None:
            from octave_tpu.models.resnest import (dense_groups_include,
                                                   groups_as_einsum)

            st.enter_context(
                groups_as_einsum(dense_groups_include(self._einsum_groups)))
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

    def warmup(self, batch: int, image_hw: Tuple[int, int],
               ks: Sequence[int] = (1,), in_channels: int = 3,
               wire_dtype=np.uint8) -> None:
        """Pre-compile the serving graphs for the given batch size and
        aggregation depths so the first real request never hits a compile
        stall (first XLA compile is ~20-40 s on a cold relay). `wire_dtype`
        must match the dtype real requests arrive in (dtype is part of the
        jit cache key)."""
        for k in sorted(set(int(k) for k in ks)):
            zeros = np.zeros((k, batch, *image_hw, in_channels), wire_dtype)
            self.predict_many_device(zeros).block_until_ready()

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


class BatchServer:
    """Queue-depth-adaptive dynamic batcher over a `Predictor`.

    The production request front-end (ROADMAP r4 item 2): callers `submit()`
    single images (h, w, c) and get a `concurrent.futures.Future` for the
    per-image output. A worker thread groups pending requests into the
    compiled `(k, batch, h, w, c)` stacks of `Predictor.predict_many` and
    picks the aggregation depth k PER DISPATCH from the queue backlog:

      * idle/low load  → k = 1, partial batch zero-padded → lowest latency
        (one ~28 ms relay dispatch over one batch);
      * backlog        → the largest k in `ks` the backlog fills → highest
        throughput (dispatch overhead amortized k×, measured in
        benchmarks/int8_ab.json: agg4 1,138 vs per-call 1,046 img/s).

    Shapes are static: every request must be exactly `image_hw` + `channels`
    (the data pipeline's resize/pad runs upstream) and every dispatch uses
    the same (k, batch) stacks compiled at warmup, so serving never
    recompiles. Zero-padded slots ride along and are dropped on the way out
    — at k=1/batch=B a single request costs one full batch of device time,
    the price of static shapes; pick `batch` for the latency SLO and let k
    scale throughput.

    Dispatch is PIPELINED (round 4): the worker thread stacks + dispatches
    chunk i+1 (JAX dispatch and host->device upload are asynchronous) while
    a resolver thread blocks on chunk i's device->host download and resolves
    its futures. Serialized upload+compute+download becomes
    max(upload, compute, download) in steady state — on the relay link,
    where the wire dominates, this roughly doubles saturated throughput
    (benchmarks/batch_server.json, pipelined rows). `pipeline_depth` bounds
    in-flight dispatches (up to depth+1 stacks of device input+output
    buffers live at once — raise it only with HBM headroom).

    Two layers of HBM protection (each enqueued execution reserves its own
    batch-scaled temp workspace on TPU, so pipelining multiplies resident
    memory): `max_inflight_rows` proactively caps concurrently-enqueued
    executions at max_inflight_rows/batch (default 128 rows ≈ two batch-64
    304² workspaces, measured safe on a 16 GB v5e); if the device still
    OOMs, the server permanently shrinks the live aggregation depths and
    re-runs the failed chunk at the smallest k with backoff — serving
    degrades instead of dying (benchmarks/batch_server.json,
    ks_live_after_oom rows).
    """

    def __init__(
        self,
        predictor: Predictor,
        batch: int = 16,
        image_hw: Tuple[int, int] = (304, 304),
        channels: int = 3,
        ks: Sequence[int] = (1, 2, 4),
        wire_dtype=np.uint8,
        warmup: bool = True,
        max_queue: int = 4096,
        pipeline_depth: int = 2,
        max_inflight_images: int = 256,
    ):
        self.predictor = predictor
        self.batch = int(batch)
        self.image_hw = tuple(image_hw)
        self.channels = int(channels)
        self.ks = tuple(sorted(set(int(k) for k in ks)))
        if not self.ks or self.ks[0] < 1:
            raise ValueError(f"ks must be positive ints, got {ks!r}")
        self.wire_dtype = np.dtype(wire_dtype)
        self._shape = (*self.image_hw, self.channels)
        if pipeline_depth < 1:
            raise ValueError(f"pipeline_depth must be >= 1, got {pipeline_depth}")
        self.pipeline_depth = int(pipeline_depth)
        # Proactive HBM protection: every ENQUEUED execution reserves temp
        # workspace that scales with its k*batch image count (measured on a
        # 16 GB v5e at 304²: four (1,64) executions coexist — 256 images —
        # but two (4,64) executions hard-OOM the chip, after which the
        # backend stays exhausted and even the reactive fallback's small
        # retries fail; benchmarks/batch_server.json). Two consequences:
        #   1. admission: the worker blocks until total enqueued images +
        #      k*batch fits max_inflight_images (a lone execution always
        #      passes);
        #   2. k capping: aggregation depths whose stacks can't run TWO
        #      abreast within the budget are dropped upfront — on a
        #      wire-bound link, pipelined small-k beats serial big-k
        #      (measured 97.9 img/s pipelined k=1 vs 43.8 serial adaptive
        #      at batch=64), so a k that would forfeit overlap is never
        #      worth dispatching. Dropped depths also skip warmup compile.
        self.max_inflight_images = int(max_inflight_images)
        if self.max_inflight_images < 1:
            raise ValueError(
                f"max_inflight_images must be >= 1, got {max_inflight_images}")
        self.ks_requested = self.ks
        usable = tuple(k for k in self.ks
                       if 2 * k * self.batch <= self.max_inflight_images)
        self.ks = usable or (self.ks[0],)
        self._ks_live = self.ks  # shrinks further on device OOM (_shrink_ks)
        self._inflight_images = 0
        self._inflight_cv = threading.Condition()
        if warmup:
            predictor.warmup(self.batch, self.image_hw, self.ks,
                             self.channels, self.wire_dtype)
        self._queue: "queue.Queue" = queue.Queue(maxsize=max_queue)
        # dispatched-but-unresolved chunks; bounded so a slow downlink
        # backpressures the worker instead of piling device buffers
        self._results: "queue.Queue" = queue.Queue(maxsize=self.pipeline_depth)
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="octave-batch-server")
        self._resolver = threading.Thread(target=self._resolve, daemon=True,
                                          name="octave-batch-resolver")
        self._worker.start()
        self._resolver.start()

    # -- client side ----------------------------------------------------
    def submit(self, image: np.ndarray) -> Future:
        """Enqueue one (h, w, c) image; returns a Future of the (h, w, ...)
        output (the predictor's output_format decides the payload)."""
        if self._closed:
            raise RuntimeError("BatchServer is closed")
        img = np.asarray(image)
        if img.shape != self._shape:
            raise ValueError(
                f"request shape {img.shape} != served shape {self._shape} "
                "(resize/pad upstream; serving shapes are compiled statically)"
            )
        if img.dtype != self.wire_dtype:
            raise ValueError(
                f"request dtype {img.dtype} != wire dtype {self.wire_dtype} "
                "(dtype is part of the compiled signature)"
            )
        fut: Future = Future()
        self._queue.put((img, fut))
        return fut

    def map(self, images: Iterable[np.ndarray]) -> Iterator[np.ndarray]:
        """Submit a stream and yield results in order (keeps enough
        requests pending to fill every pipeline slot's max-k stack, plus
        one being assembled)."""
        from collections import deque

        pending: "deque[Future]" = deque()
        depth = self.ks[-1] * self.batch * (self.pipeline_depth + 2)
        for img in images:
            while len(pending) >= depth:
                yield pending.popleft().result()
            pending.append(self.submit(img))
        while pending:
            yield pending.popleft().result()

    def close(self) -> None:
        """Drain outstanding requests, then stop the worker + resolver."""
        if self._closed:
            return
        self._closed = True
        self._queue.put(None)  # sentinel
        self._worker.join()  # worker forwards the sentinel to the resolver
        self._resolver.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- worker side ----------------------------------------------------
    def _take(self):
        """Block for the first request, then greedily drain up to
        max_k*batch more without blocking. Returns (items, stop)."""
        first = self._queue.get()
        if first is None:
            return [], True
        items = [first]
        cap = self.ks[-1] * self.batch
        stop = False
        while len(items) < cap:
            try:
                nxt = self._queue.get_nowait()
            except queue.Empty:
                break
            if nxt is None:
                stop = True
                break
            items.append(nxt)
        return items, stop

    def _pick_k(self, n: int) -> int:
        """Largest LIVE k whose stack the backlog fills at least (k-1)
        batches of — i.e. grow k only when there is work to amortize over.
        `_ks_live` starts as `ks` and shrinks permanently when a depth OOMs
        on the device (see `_is_oom`)."""
        k = self._ks_live[0]
        for cand in self._ks_live:
            if n > (cand - 1) * self.batch:
                k = cand
        return k

    @staticmethod
    def _is_oom(e: Exception) -> bool:
        """Device out-of-memory, surfaced either synchronously at dispatch
        or asynchronously when the resolver consumes the output. Pipelining
        multiplies resident temp workspace (each ENQUEUED execution reserves
        its own), so a (k, batch) stack that fits standalone at warmup can
        still OOM under depth — measured: (k=4, batch=64, depth=2) at 304²
        exhausts a 16 GB v5e (benchmarks/batch_server.json)."""
        s = f"{type(e).__name__}: {e}"
        return "RESOURCE_EXHAUSTED" in s or "ResourceExhausted" in s

    def _shrink_ks(self, failed_k: int) -> bool:
        """Permanently drop every aggregation depth >= failed_k. Returns
        False if nothing smaller is left (min k also OOMs — unrecoverable)."""
        live = [k for k in self._ks_live if k < failed_k]
        if not live:
            return False
        self._ks_live = tuple(live)
        return True

    def _stack(self, chunk, k: int) -> np.ndarray:
        stack = np.zeros((k, self.batch, *self._shape), self.wire_dtype)
        flat = stack.reshape(k * self.batch, *self._shape)
        for i, (img, _) in enumerate(chunk):
            flat[i] = img
        return stack

    def _dispatch_retrying(self, chunk, k: int):
        """Dispatch a chunk; on a synchronous OOM, back off once and retry
        at the SAME k before letting the caller shrink — enqueue-time
        allocation failures are often transient pressure from the other
        in-flight executions, not proof that k is too big."""
        import time as _time

        try:
            return self.predictor.predict_many_device(self._stack(chunk, k))
        except Exception as e:
            if not self._is_oom(e):
                raise
            _time.sleep(1.0)  # let in-flight executions drain their reservations
            return self.predictor.predict_many_device(self._stack(chunk, k))

    def _run(self) -> None:
        while True:
            items, stop = self._take()
            while items:
                k = self._pick_k(len(items))
                take = min(len(items), k * self.batch)
                chunk, items = items[:take], items[take:]
                # block until the budget admits this execution (a lone one
                # always passes); the resolver releases as chunks complete
                with self._inflight_cv:
                    while (self._inflight_images > 0 and self._inflight_images
                           + k * self.batch > self.max_inflight_images):
                        self._inflight_cv.wait()
                    self._inflight_images += k * self.batch
                try:
                    # asynchronous: returns once the upload + execution are
                    # ENQUEUED; the resolver blocks on the result while this
                    # thread stacks and dispatches the next chunk
                    out = self._dispatch_retrying(chunk, k)
                except Exception as e:
                    self._release_inflight(k)
                    if self._is_oom(e) and self._shrink_ks(k):
                        # re-chunk at the shrunk depths through the normal
                        # pipelined path (still > (min_k-1)*batch full, so
                        # _pick_k stays within the live set)
                        items = chunk + items
                        continue
                    for _, fut in chunk:  # surface the failure on every waiter
                        if not fut.done():
                            fut.set_exception(e)
                    continue
                self._results.put((chunk, k, out))  # blocks at pipeline_depth
            if stop:
                self._results.put(None)
                # resolve anything enqueued after the sentinel raced in
                while True:
                    try:
                        nxt = self._queue.get_nowait()
                    except queue.Empty:
                        return
                    if nxt is not None:
                        nxt[1].set_exception(RuntimeError("BatchServer closed"))

    def _release_inflight(self, k: int) -> None:
        with self._inflight_cv:
            self._inflight_images -= k * self.batch
            self._inflight_cv.notify_all()

    def _resolve(self) -> None:
        """Block on each dispatched chunk's device->host transfer and
        resolve its futures, in dispatch order."""
        while True:
            item = self._results.get()
            if item is None:
                return
            chunk, k, out = item
            try:
                arr = np.asarray(out)  # waits on compute + downlink
                self._release_inflight(k)
            except Exception as e:
                self._release_inflight(k)
                # An enqueued execution can fail ASYNCHRONOUSLY here (TPU
                # OOM under pipelining surfaces at consumption). Shrink the
                # live depths, then re-run THIS chunk synchronously at the
                # smallest k — one dispatch at a time, right here: the
                # resolver must never block on _results.put (it is its own
                # consumer) or _queue.put (deadlocks against a full client
                # queue while the worker waits on _results).
                if self._is_oom(e) and self._shrink_ks(k):
                    self._resolve_fallback(chunk)
                else:
                    for _, fut in chunk:
                        if not fut.done():
                            fut.set_exception(e)
                continue
            arr = arr.reshape(arr.shape[0] * arr.shape[1], *arr.shape[2:])
            for i, (_, fut) in enumerate(chunk):
                fut.set_result(arr[i])

    def _resolve_fallback(self, chunk) -> None:
        """Re-run an OOM-failed chunk at the smallest live k, synchronously
        (concurrent jit dispatch from this thread is safe; the device
        executor serializes). In-flight chunks dispatched at the old k may
        still fail the same way and land back here; `_ks_live` shrinks
        monotonically so this terminates.

        Each piece retries with backoff: right after an OOM the device is
        still saturated by the other enqueued big-k executions (each
        reserves its temp workspace at enqueue), so even a small retry can
        fail until those drain — measured on the (k=4, batch=64, depth=2)
        304² config, where the immediate k=1 retry's device_put itself hit
        RESOURCE_EXHAUSTED."""
        import time as _time

        kmin = self._ks_live[0]
        size = kmin * self.batch
        for lo in range(0, len(chunk), size):
            piece = chunk[lo:lo + size]
            for attempt in range(6):
                try:
                    out = self.predictor.predict_many_device(
                        self._stack(piece, kmin))
                    arr = np.asarray(out)
                    arr = arr.reshape(
                        arr.shape[0] * arr.shape[1], *arr.shape[2:])
                    for i, (_, fut) in enumerate(piece):
                        fut.set_result(arr[i])
                    break
                except Exception as e:
                    if self._is_oom(e) and attempt < 5:
                        _time.sleep(0.5 * (2 ** attempt))  # let the device drain
                        continue
                    for _, fut in piece:
                        if not fut.done():
                            fut.set_exception(e)
                    break
