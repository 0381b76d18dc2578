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
