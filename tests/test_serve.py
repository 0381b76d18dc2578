"""Serving predictor: sync + pipelined streams give identical results."""
import jax.numpy as jnp
import numpy as np
import pytest

from octave_tpu.serve import Predictor


@pytest.mark.slow
def test_predictor_sync_and_stream(rng):
    pred = Predictor.initialize(image_hw=(32, 32), dtype=jnp.float32)
    batches = [rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32) for _ in range(4)]
    sync = [pred(b) for b in batches]
    stream = list(pred.predict_stream(iter(batches), depth=2))
    assert len(stream) == 4
    for s, t in zip(sync, stream):
        np.testing.assert_allclose(s, t, atol=1e-6)
    assert sync[0].shape == (2, 32, 32, 2)
    np.testing.assert_allclose(sync[0].sum(-1), 1.0, atol=1e-5)


@pytest.mark.slow
def test_predictor_einsum_groups_exact(rng):
    """einsum_groups lowering (models/resnest.py::grouped_conv_einsum) is
    exact math in the serving graph: fp32 outputs match the grouped-conv
    baseline to reassociation tolerance for decoder and encoder scopes."""
    pred = Predictor.initialize(image_hw=(32, 32), dtype=jnp.float32,
                                fold_bn=False)
    x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    y0 = pred(x)
    e = Predictor(pred.variables, dtype=jnp.float32, fold_bn=False,
                  einsum_groups="decoder+enc")
    np.testing.assert_allclose(e(x), y0, atol=1e-5)


@pytest.mark.slow
def test_predictor_mesh(rng):
    """Mesh-sharded Predictor: batch fans out over the 8-device CPU mesh."""
    from octave_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    pred = Predictor.initialize(image_hw=(32, 32), dtype=jnp.float32, mesh=mesh)
    x = rng.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32)
    out = pred(x)
    assert out.shape == (8, 32, 32, 2)
    # same weights, no mesh → identical results
    single = Predictor.initialize(image_hw=(32, 32), dtype=jnp.float32)
    np.testing.assert_allclose(out, single(x), atol=1e-5)


@pytest.mark.slow
def test_predict_many_mesh(rng):
    """Aggregated dispatch under a data mesh: each batch in the stack fans
    out over the 8-device CPU mesh; results match the unmeshed path."""
    from octave_tpu.parallel.mesh import make_mesh

    pred = Predictor.initialize(image_hw=(32, 32), dtype=jnp.float32,
                                mesh=make_mesh())
    stack = rng.uniform(0, 1, (2, 8, 32, 32, 3)).astype(np.float32)
    many = pred.predict_many(stack)
    assert many.shape == (2, 8, 32, 32, 2)
    single = Predictor.initialize(image_hw=(32, 32), dtype=jnp.float32)
    np.testing.assert_allclose(many[0], single(stack[0]), atol=1e-5)


@pytest.mark.slow
def test_predict_many_matches_per_batch(rng):
    """Scan-aggregated dispatch (one device call for k batches) == k sync
    calls. This is the throughput-serving path on high-dispatch-latency
    links (docs/architecture.md 'Serving through the relay')."""
    pred = Predictor.initialize(image_hw=(32, 32), dtype=jnp.float32)
    stack = rng.uniform(0, 1, (3, 2, 32, 32, 3)).astype(np.float32)
    many = pred.predict_many(stack)
    assert many.shape == (3, 2, 32, 32, 2)
    for i in range(3):
        np.testing.assert_allclose(many[i], pred(stack[i]), atol=1e-6)


@pytest.mark.slow
def test_predictor_uint8_wire(rng):
    """uint8 input == float input/255 (device-side normalization)."""
    pred = Predictor.initialize(image_hw=(32, 32), dtype=jnp.float32)
    img8 = rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8)
    a = pred(img8)
    b = pred(img8.astype(np.float32) / 255.0)
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.slow
def test_predictor_output_formats(rng):
    img8 = rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8)
    ref = Predictor.initialize(image_hw=(32, 32), dtype=jnp.float32)(img8)
    m = Predictor.initialize(image_hw=(32, 32), dtype=jnp.float32,
                             output_format="mask_u8")(img8)
    assert m.shape == (1, 32, 32) and m.dtype == np.uint8
    np.testing.assert_array_equal(m > 0, ref[..., 1] >= 0.5)
    h = Predictor.initialize(image_hw=(32, 32), dtype=jnp.float32,
                             output_format="prob_f16")(img8)
    assert h.dtype == np.float16
    np.testing.assert_allclose(h, ref, atol=1e-3)


@pytest.mark.slow
class TestBatchServer:
    """Queue-depth-adaptive dynamic batcher (serve.BatchServer).

    All tests share ONE class-scoped Predictor so the jitted graphs
    (direct batch=2, predict_many k=1 and k=2) compile once — jax.jit
    caches by input shape, so every BatchServer built on the same
    predictor reuses them (CPU compiles dominate test wall time)."""

    @pytest.fixture(scope="class")
    def pred(self):
        return Predictor.initialize(image_hw=(32, 32), dtype=jnp.float32)

    def _server(self, pred, **kw):
        from octave_tpu.serve import BatchServer

        kw.setdefault("batch", 2)
        kw.setdefault("image_hw", (32, 32))
        kw.setdefault("ks", (1, 2))
        kw.setdefault("warmup", False)  # lazy-compile only the ks a test hits
        return BatchServer(pred, **kw)

    def test_results_match_direct_and_order(self, pred, rng):
        imgs = [rng.integers(0, 256, (32, 32, 3), dtype=np.uint8) for _ in range(7)]
        with self._server(pred) as srv:
            outs = list(srv.map(iter(imgs)))
        assert len(outs) == 7
        # ground truth from the direct batch=2 path: each image's output
        # must not depend on which slot/batch the server routed it through
        for i, (img, out) in enumerate(zip(imgs, outs)):
            want = pred(np.stack([img, imgs[(i + 1) % 7]]))[0]
            np.testing.assert_allclose(out, want, atol=1e-5)

    def test_padding_slots_do_not_leak(self, pred, rng):
        # 1 request into batch=2: the zero-padded slot must be dropped
        img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        with self._server(pred) as srv:
            out = srv.submit(img).result(timeout=600)
        assert out.shape == (32, 32, 2)
        np.testing.assert_allclose(out, pred(np.stack([img, img]))[0], atol=1e-5)

    def test_shape_and_dtype_validation(self, pred):
        with self._server(pred) as srv:
            with pytest.raises(ValueError, match="shape"):
                srv.submit(np.zeros((16, 16, 3), np.uint8))
            with pytest.raises(ValueError, match="dtype"):
                srv.submit(np.zeros((32, 32, 3), np.float32))

    def test_submit_after_close_raises(self, pred):
        srv = self._server(pred)
        srv.close()
        srv.close()  # idempotent
        with pytest.raises(RuntimeError, match="closed"):
            srv.submit(np.zeros((32, 32, 3), np.uint8))

    def test_pipelined_flood_results_correct(self, pred, rng):
        # 37 requests with pipeline_depth=3: several chunks are in flight
        # at once (worker dispatches i+1 while the resolver downloads i);
        # every future must still resolve to its own image's direct output
        imgs = [rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
                for _ in range(37)]
        with self._server(pred, pipeline_depth=3) as srv:
            futs = [srv.submit(img) for img in imgs]
            outs = [f.result(timeout=600) for f in futs]
        direct = pred(np.stack(imgs[:2]))  # same graph, any 2 images
        assert outs[0].shape == direct[0].shape
        for img, out in zip(imgs, outs):
            want = pred(np.stack([img, img]))[0]
            np.testing.assert_allclose(out, want, atol=1e-5)

    def test_pipeline_depth_one_and_validation(self, pred, rng):
        img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        with self._server(pred, pipeline_depth=1) as srv:
            out = srv.submit(img).result(timeout=600)
        np.testing.assert_allclose(out, pred(np.stack([img, img]))[0],
                                   atol=1e-5)
        with pytest.raises(ValueError, match="pipeline_depth"):
            self._server(pred, pipeline_depth=0)

    def test_pick_k_grows_with_backlog(self, pred):
        with self._server(pred, ks=(1, 2, 4)) as srv:
            assert srv._pick_k(1) == 1
            assert srv._pick_k(2) == 1
            assert srv._pick_k(3) == 2
            assert srv._pick_k(4) == 2
            # k=4 pads 3 of 8 slots at n=5 — grow only once the backlog
            # fills (k-1) full batches, i.e. n > 6
            assert srv._pick_k(5) == 2
            assert srv._pick_k(6) == 2
            assert srv._pick_k(7) == 4
            assert srv._pick_k(800) == 4


class FakePredictor:
    """Deterministic device-free stand-in implementing the two methods
    BatchServer consumes (`warmup`, `predict_many_device`). Output per
    image i is a function of that image's bytes, so any routing/slot/order
    bug in the server produces a wrong answer, not a flaky one. A tiny
    sleep emulates device latency so the pipelined worker/resolver overlap
    is actually exercised (several chunks in flight at once)."""

    def __init__(self, latency_s: float = 0.002):
        self.latency_s = latency_s
        self.dispatches = []  # (k, batch) per predict_many_device call

    def warmup(self, batch, image_hw, ks, channels, wire_dtype):
        pass

    @staticmethod
    def expected(img: np.ndarray) -> np.ndarray:
        x = img.astype(np.float32) / 255.0
        m = x.mean(-1)
        return np.stack([m, 1.0 - m], axis=-1)

    def predict_many_device(self, stack):
        import time

        self.dispatches.append(stack.shape[:2])
        time.sleep(self.latency_s)
        x = stack.astype(np.float32) / 255.0
        m = x.mean(-1)
        return np.stack([m, 1.0 - m], axis=-1)  # (k, b, h, w, 2)


@pytest.mark.smoke
class TestBatchServerLogic:
    """Quick-tier coverage of every BatchServer code path (queueing,
    adaptive k, zero-pad slots, pipelining, validation, close) against the
    device-free FakePredictor — the real-Predictor integration versions of
    these tests live in the slow tier (TestBatchServer above), where the
    full-model CPU compiles are affordable."""

    HW = (8, 8)

    def _server(self, fake=None, **kw):
        from octave_tpu.serve import BatchServer

        kw.setdefault("batch", 2)
        kw.setdefault("image_hw", self.HW)
        kw.setdefault("ks", (1, 2))
        return fake or FakePredictor(), kw

    def _make(self, fake=None, **kw):
        from octave_tpu.serve import BatchServer

        fake, kw = self._server(fake, **kw)
        return fake, BatchServer(fake, **kw)

    def test_results_match_direct_and_order(self, rng):
        imgs = [rng.integers(0, 256, (*self.HW, 3), dtype=np.uint8)
                for _ in range(7)]
        fake, srv = self._make()
        with srv:
            outs = list(srv.map(iter(imgs)))
        assert len(outs) == 7
        for img, out in zip(imgs, outs):
            np.testing.assert_allclose(out, FakePredictor.expected(img),
                                       atol=1e-6)

    def test_padding_slots_do_not_leak(self, rng):
        img = rng.integers(0, 256, (*self.HW, 3), dtype=np.uint8)
        fake, srv = self._make()
        with srv:
            out = srv.submit(img).result(timeout=60)
        assert out.shape == (*self.HW, 2)
        np.testing.assert_allclose(out, FakePredictor.expected(img), atol=1e-6)
        # exactly one k=1 dispatch of the compiled (k, batch) stack
        assert fake.dispatches == [(1, 2)]

    def test_shape_and_dtype_validation(self):
        _, srv = self._make()
        with srv:
            with pytest.raises(ValueError, match="shape"):
                srv.submit(np.zeros((4, 4, 3), np.uint8))
            with pytest.raises(ValueError, match="dtype"):
                srv.submit(np.zeros((*self.HW, 3), np.float32))

    def test_submit_after_close_raises(self):
        _, srv = self._make()
        srv.close()
        srv.close()  # idempotent
        with pytest.raises(RuntimeError, match="closed"):
            srv.submit(np.zeros((*self.HW, 3), np.uint8))

    def test_pipelined_flood_results_correct(self, rng):
        imgs = [rng.integers(0, 256, (*self.HW, 3), dtype=np.uint8)
                for _ in range(200)]
        fake, srv = self._make(pipeline_depth=3, ks=(1, 2, 4))
        with srv:
            futs = [srv.submit(img) for img in imgs]
            outs = [f.result(timeout=60) for f in futs]
        for img, out in zip(imgs, outs):
            np.testing.assert_allclose(out, FakePredictor.expected(img),
                                       atol=1e-6)
        # under flood the adaptive policy must have aggregated past k=1
        assert any(k > 1 for k, _ in fake.dispatches), fake.dispatches

    def test_pipeline_depth_one_and_validation(self, rng):
        img = rng.integers(0, 256, (*self.HW, 3), dtype=np.uint8)
        _, srv = self._make(pipeline_depth=1)
        with srv:
            out = srv.submit(img).result(timeout=60)
        np.testing.assert_allclose(out, FakePredictor.expected(img), atol=1e-6)
        with pytest.raises(ValueError, match="pipeline_depth"):
            self._make(pipeline_depth=0)

    def test_worker_exception_propagates_to_futures(self, rng):
        class Boom(FakePredictor):
            def predict_many_device(self, stack):
                raise RuntimeError("device on fire")

        img = rng.integers(0, 256, (*self.HW, 3), dtype=np.uint8)
        _, srv = self._make(fake=Boom())
        with srv:
            fut = srv.submit(img)
            with pytest.raises(RuntimeError, match="device on fire"):
                fut.result(timeout=60)

    def test_pick_k_grows_with_backlog(self):
        _, srv = self._make(ks=(1, 2, 4))
        with srv:
            assert srv._pick_k(1) == 1
            assert srv._pick_k(2) == 1
            assert srv._pick_k(3) == 2
            assert srv._pick_k(6) == 2
            assert srv._pick_k(7) == 4
            assert srv._pick_k(800) == 4

    def test_oom_at_dispatch_shrinks_ks_and_recovers(self, rng):
        """Synchronous device OOM on a k>1 dispatch: the server permanently
        drops the failed depth, re-chunks, and every request still resolves
        correctly (measured failure mode: (k=4,batch=64,depth=2) at 304²
        exhausts v5e HBM — benchmarks/batch_server.json)."""
        class OomAbove1(FakePredictor):
            def predict_many_device(self, stack):
                if stack.shape[0] > 1:
                    raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")
                return super().predict_many_device(stack)

        imgs = [rng.integers(0, 256, (*self.HW, 3), dtype=np.uint8)
                for _ in range(100)]
        fake, srv = self._make(fake=OomAbove1(), ks=(1, 2, 4),
                               pipeline_depth=2)
        with srv:
            futs = [srv.submit(img) for img in imgs]
            outs = [f.result(timeout=60) for f in futs]
        for img, out in zip(imgs, outs):
            np.testing.assert_allclose(out, FakePredictor.expected(img),
                                       atol=1e-6)
        assert srv._ks_live == (1,)
        # every SUCCESSFUL dispatch ran at k=1
        assert all(k == 1 for k, _ in fake.dispatches)

    def test_oom_at_resolve_falls_back_and_recovers(self, rng):
        """Asynchronous OOM (surfaces when the resolver consumes the
        output): the resolver shrinks the live depths and re-runs the chunk
        synchronously at the smallest k."""
        class LazyFail:
            def __array__(self, dtype=None, copy=None):
                raise RuntimeError("RESOURCE_EXHAUSTED: async execution")

        class AsyncOom(FakePredictor):
            def predict_many_device(self, stack):
                if stack.shape[0] > 1:
                    self.dispatches.append(stack.shape[:2])
                    return LazyFail()
                return super().predict_many_device(stack)

        imgs = [rng.integers(0, 256, (*self.HW, 3), dtype=np.uint8)
                for _ in range(60)]
        fake, srv = self._make(fake=AsyncOom(), ks=(1, 2), pipeline_depth=2)
        with srv:
            futs = [srv.submit(img) for img in imgs]
            outs = [f.result(timeout=60) for f in futs]
        for img, out in zip(imgs, outs):
            np.testing.assert_allclose(out, FakePredictor.expected(img),
                                       atol=1e-6)
        assert srv._ks_live == (1,)

    def test_inflight_image_budget_enforced(self, rng):
        """The proactive HBM budget: enqueued-but-unresolved images never
        exceed max_inflight_images, and k values whose stacks can't run two
        abreast within the budget are dropped upfront (enqueued executions
        reserve workspace scaling with k*batch on TPU — the unbudgeted
        pipeline hard-OOMed at (k=4, batch=64, depth=2), and so did two
        such executions abreast; batch_server.json)."""
        import threading
        import time

        class LazyOut:
            def __init__(self, fake, arr):
                self.fake, self.arr = fake, arr

            def __array__(self, dtype=None, copy=None):
                time.sleep(0.01)  # hold the reservation: worker runs ahead
                with self.fake.lock:
                    self.fake.cur -= 1
                return self.arr

        class Tracking(FakePredictor):
            def __init__(self):
                super().__init__(latency_s=0.0)
                self.cur = 0
                self.peak = 0
                self.lock = threading.Lock()

            def predict_many_device(self, stack):
                with self.lock:
                    self.cur += 1
                    self.peak = max(self.peak, self.cur)
                return LazyOut(self, super().predict_many_device(stack))

        imgs = [rng.integers(0, 256, (*self.HW, 3), dtype=np.uint8)
                for _ in range(200)]
        fake, srv = self._make(fake=Tracking(), ks=(1, 2, 4),
                               pipeline_depth=3, max_inflight_images=4)
        with srv:
            assert srv.ks_requested == (1, 2, 4)
            assert srv.ks == (1,)  # k=2/4 stacks can't run two abreast in 4
            futs = [srv.submit(img) for img in imgs]
            outs = [f.result(timeout=60) for f in futs]
        for img, out in zip(imgs, outs):
            np.testing.assert_allclose(out, FakePredictor.expected(img),
                                       atol=1e-6)
        assert fake.peak <= 2, fake.peak  # 4 images / (k=1 * batch=2)
        with pytest.raises(ValueError, match="max_inflight_images"):
            self._make(max_inflight_images=0)

    def test_oom_at_min_k_is_unrecoverable(self, rng):
        class AlwaysOom(FakePredictor):
            def predict_many_device(self, stack):
                raise RuntimeError("RESOURCE_EXHAUSTED: even k=1")

        img = rng.integers(0, 256, (*self.HW, 3), dtype=np.uint8)
        _, srv = self._make(fake=AlwaysOom())
        with srv:
            fut = srv.submit(img)
            with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
                fut.result(timeout=60)
