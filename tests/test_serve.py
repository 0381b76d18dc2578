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


def test_predictor_uint8_wire(rng):
    """uint8 input == float input/255 (device-side normalization)."""
    pred = Predictor.initialize(image_hw=(32, 32), dtype=jnp.float32)
    img8 = rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8)
    a = pred(img8)
    b = pred(img8.astype(np.float32) / 255.0)
    np.testing.assert_allclose(a, b, atol=1e-5)


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
