"""Pallas kernels vs their pure-XLA references (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octave_tpu.ops.pallas.aag import fused_aag


def _reference_aag(x, w, b):
    logits = jnp.einsum("bhwc,ck->bhwk", x, w) + b
    yhat = jax.nn.softmax(logits, axis=-1)
    mask = jnp.sum(yhat[..., 1:], axis=-1, keepdims=True)
    return x * mask, yhat


class TestFusedAAG:
    @pytest.mark.parametrize("shape,k", [((2, 19, 19, 32), 2), ((1, 10, 13, 64), 3)])
    def test_forward_matches_reference(self, rng, shape, k):
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        w = jnp.asarray(rng.standard_normal((shape[-1], k)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.standard_normal((k,)) * 0.1, jnp.float32)
        out, yhat = fused_aag(x, w, b)
        ref_out, ref_yhat = _reference_aag(x, w, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-5)
        np.testing.assert_allclose(np.asarray(yhat), np.asarray(ref_yhat), atol=1e-6)

    def test_grad_matches_reference(self, rng):
        shape, k = (1, 8, 8, 16), 2
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        w = jnp.asarray(rng.standard_normal((shape[-1], k)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.standard_normal((k,)) * 0.1, jnp.float32)

        def loss_fused(x, w, b):
            out, yhat = fused_aag(x, w, b)
            return jnp.sum(out**2) + jnp.sum(yhat * jnp.cos(yhat))

        def loss_ref(x, w, b):
            out, yhat = _reference_aag(x, w, b)
            return jnp.sum(out**2) + jnp.sum(yhat * jnp.cos(yhat))

        g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
        for a, r in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-4)

    def test_non_tile_aligned_rows(self, rng):
        # 3*7*7 = 147 rows: not a multiple of the 512-row tile
        x = jnp.asarray(rng.standard_normal((3, 7, 7, 8)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((8, 2)) * 0.1, jnp.float32)
        b = jnp.zeros((2,), jnp.float32)
        out, yhat = fused_aag(x, w, b)
        ref_out, ref_yhat = _reference_aag(x, w, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-5)
        np.testing.assert_allclose(np.asarray(yhat), np.asarray(ref_yhat), atol=1e-6)


@pytest.mark.slow
def test_unet_with_pallas_aag_matches(rng):
    """Full segmentor with use_pallas_aag: identical params + outputs."""
    from octave_tpu.models.segmentor import ResnestUNet

    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)
    m0 = ResnestUNet(num_classes=2)
    m1 = ResnestUNet(num_classes=2, use_pallas_aag=True)
    v = m0.init(jax.random.PRNGKey(0), x, False)
    atts0, agg0, _ = m0.apply(v, x, False)
    atts1, agg1, _ = m1.apply(v, x, False)
    np.testing.assert_allclose(np.asarray(agg0), np.asarray(agg1), atol=1e-5)
    for a0, a1 in zip(atts0, atts1):
        np.testing.assert_allclose(np.asarray(a0), np.asarray(a1), atol=1e-5)


class TestFusedDecoderEpilogue:
    def _reference(self, z, attn_logits, res, rs, rb, w, b):
        c = z.shape[-1] // 2
        a = jax.nn.softmax(attn_logits.reshape(z.shape[0], 2, c), axis=1)
        s = z[..., :c] * a[:, 0][:, None, None, :] + z[..., c:] * a[:, 1][:, None, None, :]
        # decoder block tail: relu(residual_affine + relu(splat_out))
        y = jax.nn.relu(jax.nn.relu(s) + res * rs + rb)
        logits = jnp.einsum("bhwc,ck->bhwk", y, w) + b
        yh = jax.nn.softmax(logits, axis=-1)
        mask = jnp.sum(yh[..., 1:], axis=-1, keepdims=True)
        return y * mask, yh

    @pytest.mark.parametrize("shape,k", [((2, 8, 10, 16), 2), ((1, 6, 6, 32), 3)])
    def test_matches_reference(self, rng, shape, k):
        from octave_tpu.ops.pallas.decoder_epilogue import fused_decoder_epilogue

        b_, h, w_, c = shape
        z = jnp.asarray(rng.standard_normal((b_, h, w_, 2 * c)), jnp.float32)
        attn = jnp.asarray(rng.standard_normal((b_, 2 * c)), jnp.float32)
        res = jnp.asarray(rng.standard_normal((b_, h, w_, c)), jnp.float32)
        rs = jnp.asarray(rng.uniform(0.5, 2, (c,)), jnp.float32)
        rb = jnp.asarray(rng.uniform(-1, 1, (c,)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((c, k)) * 0.1, jnp.float32)
        bb = jnp.asarray(rng.standard_normal((k,)) * 0.1, jnp.float32)
        out, yh = fused_decoder_epilogue(z, attn, res, rs, rb, w, bb)
        ref_out, ref_yh = self._reference(z, attn, res, rs, rb, w, bb)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-5)
        np.testing.assert_allclose(np.asarray(yh), np.asarray(ref_yh), atol=1e-5)


@pytest.mark.slow
def test_unet_with_fused_decoder_matches(rng):
    """Full segmentor with use_fused_decoder: identical params, outputs
    match the unfused eval path (the fused tail covers radix apply + inner
    ReLU + shortcut-BN affine + residual + outer ReLU + AAG)."""
    from octave_tpu.models.segmentor import ResnestUNet

    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)
    m0 = ResnestUNet(num_classes=2)
    m1 = ResnestUNet(num_classes=2, use_fused_decoder=True)
    v = m0.init(jax.random.PRNGKey(0), x, False)
    # identical param trees (checkpoint compatibility)
    assert jax.tree_util.tree_structure(
        m1.init(jax.random.PRNGKey(0), x, False)
    ) == jax.tree_util.tree_structure(v)
    atts0, agg0, _ = m0.apply(v, x, False)
    atts1, agg1, _ = m1.apply(v, x, False)
    np.testing.assert_allclose(np.asarray(agg0), np.asarray(agg1), atol=1e-4)
    for a0, a1 in zip(atts0, atts1):
        np.testing.assert_allclose(np.asarray(a0), np.asarray(a1), atol=1e-4)


@pytest.mark.slow
def test_unet_fused_decoder_folded_bn_matches(rng):
    """Fused decoder under fold_batch_stats + folded_inference (the
    production serving config) still matches the plain eval forward."""
    from octave_tpu.models.segmentor import ResnestUNet
    from octave_tpu.ops.norm import fold_batch_stats, folded_inference

    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)
    m0 = ResnestUNet(num_classes=2)
    m1 = ResnestUNet(num_classes=2, use_fused_decoder=True)
    v = m0.init(jax.random.PRNGKey(0), x, False)
    # make the stats non-trivial so folding actually changes the affine
    v = jax.tree.map(lambda p: p, v)
    import flax

    stats = flax.traverse_util.flatten_dict(v["batch_stats"])
    key = jax.random.PRNGKey(1)
    new_stats = {}
    for path, val in stats.items():
        key, k2 = jax.random.split(key)
        if path[-1] == "mean":
            new_stats[path] = 0.1 * jax.random.normal(k2, val.shape)
        else:
            new_stats[path] = 1.0 + 0.2 * jax.random.uniform(k2, val.shape)
    v = dict(v)
    v["batch_stats"] = flax.traverse_util.unflatten_dict(new_stats)

    atts0, agg0, _ = m0.apply(v, x, False)
    vf = fold_batch_stats(v)
    with folded_inference():
        atts1, agg1, _ = m1.apply(vf, x, False)
    np.testing.assert_allclose(np.asarray(agg0), np.asarray(agg1), atol=2e-4)
    for a0, a1 in zip(atts0, atts1):
        np.testing.assert_allclose(np.asarray(a0), np.asarray(a1), atol=2e-4)
