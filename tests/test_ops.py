"""torch-semantics parity for the low-level ops (pooling, resize, transpose
conv) — these encode the exact padding/count conventions the model depends on."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octave_tpu.ops.common import (
    adaptive_avg_pool2d,
    avg_pool2d,
    conv_transpose_2x2,
    max_pool2d,
    nearest_resize,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F


def _to_nhwc(x):
    return jnp.asarray(x).transpose(0, 2, 3, 1)


def _to_nchw(y):
    return np.asarray(y).transpose(0, 3, 1, 2)


@pytest.mark.parametrize("hw", [16, 19, 25, 76, 77])
def test_max_pool_3x3_s2_p1(rng, hw):
    x = rng.standard_normal((2, 3, hw, hw), dtype=np.float32)
    t = F.max_pool2d(torch.from_numpy(x), 3, 2, 1).numpy()
    j = _to_nchw(max_pool2d(_to_nhwc(x), 3, 2, 1))
    np.testing.assert_allclose(t, j, rtol=0, atol=0)


@pytest.mark.parametrize("hw", [10, 19, 20, 25, 26, 38])
def test_avd_avg_pool_3x3_s2_p1_count_include_pad(rng, hw):
    x = rng.standard_normal((2, 3, hw, hw), dtype=np.float32)
    t = F.avg_pool2d(torch.from_numpy(x), 3, 2, 1).numpy()
    j = _to_nchw(avg_pool2d(_to_nhwc(x), 3, 2, 1, count_include_pad=True))
    np.testing.assert_allclose(t, j, rtol=0, atol=1e-6)


@pytest.mark.parametrize("hw,k", [(10, 2), (20, 2), (26, 2), (25, 2), (9, 2), (7, 3)])
def test_downsample_avg_pool_ceil_nocount(rng, hw, k):
    """avg_down shortcut pool: kernel=stride, ceil_mode=True,
    count_include_pad=False (resnest.py:383-384)."""
    x = rng.standard_normal((2, 3, hw, hw), dtype=np.float32)
    t = F.avg_pool2d(torch.from_numpy(x), k, k, 0, ceil_mode=True,
                     count_include_pad=False).numpy()
    j = _to_nchw(avg_pool2d(_to_nhwc(x), k, k, 0, count_include_pad=False, ceil_mode=True))
    assert t.shape == j.shape
    np.testing.assert_allclose(t, j, rtol=0, atol=1e-6)


@pytest.mark.parametrize("out", [(1, 1), (32, 32), (5, 7)])
def test_adaptive_avg_pool(rng, out):
    x = rng.standard_normal((2, 3, 33, 41), dtype=np.float32)
    t = F.adaptive_avg_pool2d(torch.from_numpy(x), out).numpy()
    j = _to_nchw(adaptive_avg_pool2d(_to_nhwc(x), out))
    np.testing.assert_allclose(t, j, rtol=0, atol=1e-5)


@pytest.mark.parametrize("src,dst", [(19, 304), (25, 400), (38, 304), (17, 40), (40, 17)])
def test_nearest_resize_torch_convention(rng, src, dst):
    x = rng.standard_normal((1, 2, src, src), dtype=np.float32)
    t = F.interpolate(torch.from_numpy(x), size=(dst, dst), mode="nearest").numpy()
    j = _to_nchw(nearest_resize(_to_nhwc(x), (dst, dst)))
    np.testing.assert_allclose(t, j, rtol=0, atol=0)


@pytest.mark.parametrize("impl", ["einsum", "native"])
def test_conv_transpose_2x2(rng, impl):
    from octave_tpu.ops.common import set_conv_transpose_impl

    x = rng.standard_normal((2, 6, 9, 11), dtype=np.float32)
    w = rng.standard_normal((6, 4, 2, 2), dtype=np.float32)
    b = rng.standard_normal((4,), dtype=np.float32)
    t = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                           torch.from_numpy(b), stride=2).numpy()
    set_conv_transpose_impl(impl)
    try:
        j = _to_nchw(conv_transpose_2x2(_to_nhwc(x), jnp.asarray(w), jnp.asarray(b)))
    finally:
        set_conv_transpose_impl("einsum")
    np.testing.assert_allclose(t, j, rtol=1e-5, atol=1e-5)


def test_batchnorm_train_running_stats(rng):
    """Torch momentum/unbiased-variance running-stat updates."""
    from octave_tpu.ops.norm import BatchNorm

    x = rng.standard_normal((4, 6, 5, 3), dtype=np.float32)
    tbn = torch.nn.BatchNorm2d(3)
    tbn.train()
    with torch.no_grad():
        ty = tbn(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

    jbn = BatchNorm(3)
    variables = jbn.init(jax.random.PRNGKey(0), jnp.asarray(x), True)
    jy, mutated = jbn.apply(variables, jnp.asarray(x), True, mutable=["batch_stats"])
    np.testing.assert_allclose(ty, _to_nchw(jy)[:, :, :, :].transpose(0, 2, 3, 1).transpose(0, 3, 1, 2), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        tbn.running_mean.numpy(), np.asarray(mutated["batch_stats"]["mean"]), atol=1e-6
    )
    np.testing.assert_allclose(
        tbn.running_var.numpy(), np.asarray(mutated["batch_stats"]["var"]), rtol=1e-5
    )


def test_bn_folding_exact(rng):
    """fold_batch_stats + folded_inference == standard eval, exactly."""
    from octave_tpu.ops.norm import BatchNorm, fold_batch_stats, folded_inference

    bn = BatchNorm(6)
    x = jnp.asarray(rng.standard_normal((2, 5, 5, 6)), jnp.float32)
    v = bn.init(jax.random.PRNGKey(0), x, False)
    # non-trivial stats/params
    v = {
        "params": {"scale": jnp.asarray(rng.uniform(0.5, 2, 6), jnp.float32),
                   "bias": jnp.asarray(rng.uniform(-1, 1, 6), jnp.float32)},
        "batch_stats": {"mean": jnp.asarray(rng.uniform(-1, 1, 6), jnp.float32),
                        "var": jnp.asarray(rng.uniform(0.5, 2, 6), jnp.float32)},
    }
    ref = bn.apply(v, x, False)
    vf = fold_batch_stats(v)
    with folded_inference():
        out = bn.apply(vf, x, False)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-6)
    # context off → folded variables give WRONG results (guard against misuse)
    out2 = bn.apply(vf, x, False)
    assert float(jnp.abs(ref - out2).max()) > 1e-3
