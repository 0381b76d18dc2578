"""Block-granular rematerialization (remat_blocks / StepConfig.remat='block').

Property: nn.remat is a lifted transform, so wrapping each Bottleneck /
decoder stage must leave the parameter tree, forward values, and BN stats
identical. Gradients are identical up to f32 recompute-reordering noise
(measured: whole-forward jax.checkpoint — the semantics remat=True always
had — deviates MORE from the plain graph than remat_blocks does).

Why this exists: one checkpoint region over the entire forward saves almost
no memory — the backward recomputes the whole forward and holds every
intermediate at once (15.26 → 14.48 GB temps at B=64/304², recorded in
benchmarks/train_scaling.json). Block-granular regions keep only the
inter-block residuals live.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from octave_tpu.models.resnest import Bottleneck, ResNestDecoder
from octave_tpu.models.segmentor import ResnestUNet


def _grad_rel_l2(g0, g1):
    n0 = math.sqrt(sum(float((g**2).sum()) for g in jax.tree.leaves(g0)))
    d = math.sqrt(
        sum(
            float(((a - b) ** 2).sum())
            for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1))
        )
    )
    return d / n0


@pytest.mark.slow
def test_bottleneck_remat_bit_exact():
    kw = dict(inplanes=64, planes=32, strides=1, has_downsample=True,
              radix=2, avd=True, is_first=True, avg_down=True)
    blk = Bottleneck(**kw)
    rblk = nn.remat(Bottleneck, static_argnums=(2,))(**kw)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (2, 16, 16, 64)), jnp.float32
    )
    v = blk.init(jax.random.PRNGKey(0), x, True)
    assert jax.tree.structure(v) == jax.tree.structure(
        rblk.init(jax.random.PRNGKey(0), x, True)
    )
    o0, m0 = blk.apply(v, x, True, mutable=["batch_stats"])
    o1, m1 = rblk.apply(v, x, True, mutable=["batch_stats"])
    assert bool(jnp.all(o0 == o1))
    assert jax.tree.all(jax.tree.map(lambda a, b: bool(jnp.all(a == b)), m0, m1))

    def loss(m, p):
        out, _ = m.apply({**v, "params": p}, x, True, mutable=["batch_stats"])
        return (out**2).sum()

    g0 = jax.grad(lambda p: loss(blk, p))(v["params"])
    g1 = jax.grad(lambda p: loss(rblk, p))(v["params"])
    assert jax.tree.all(jax.tree.map(lambda a, b: bool(jnp.all(a == b)), g0, g1))


@pytest.mark.slow
def test_decoder_remat_bit_exact():
    d0 = ResNestDecoder(128, 64)
    d1 = nn.remat(ResNestDecoder, static_argnums=(2,))(128, 64)
    rng = np.random.default_rng(0)
    inp = (
        jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 64)), jnp.float32),
        jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 64)), jnp.float32),
    )
    v = d0.init(jax.random.PRNGKey(0), inp, True)
    o0, _ = d0.apply(v, inp, True, mutable=["batch_stats"])
    o1, _ = d1.apply(v, inp, True, mutable=["batch_stats"])
    assert bool(jnp.all(o0 == o1))

    def loss(d, p):
        out, _ = d.apply({**v, "params": p}, inp, True, mutable=["batch_stats"])
        return (out**2).sum()

    g0 = jax.grad(lambda p: loss(d0, p))(v["params"])
    g1 = jax.grad(lambda p: loss(d1, p))(v["params"])
    assert jax.tree.all(jax.tree.map(lambda a, b: bool(jnp.all(a == b)), g0, g1))


@pytest.mark.slow
def test_unet_remat_blocks_equivalent():
    m0 = ResnestUNet(num_classes=2)
    m1 = ResnestUNet(num_classes=2, remat_blocks=True)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, 48, 48, 3)), jnp.float32
    )
    v0 = m0.init(jax.random.PRNGKey(0), x, True)
    assert jax.tree.structure(v0) == jax.tree.structure(
        m1.init(jax.random.PRNGKey(0), x, True)
    )
    (a0, agg0, _), s0 = m0.apply(v0, x, True, mutable=["batch_stats"])
    (a1, agg1, _), s1 = m1.apply(v0, x, True, mutable=["batch_stats"])
    assert float(jnp.abs(agg0 - agg1).max()) < 1e-4
    for p0, p1 in zip(a0, a1):
        assert float(jnp.abs(p0 - p1).max()) < 1e-4
    stats_close = jax.tree.map(
        lambda a, b: bool(jnp.allclose(a, b, rtol=2e-3, atol=1e-4)), s0, s1
    )
    assert jax.tree.all(stats_close)

    def mkloss(m):
        def loss(p):
            (atts, agg, _), _ = m.apply(
                {**v0, "params": p}, x, True, mutable=["batch_stats"]
            )
            return (agg**2).sum() + sum(((a[..., :1]) ** 2).sum() for a in atts)

        return loss

    g0 = jax.grad(mkloss(m0))(v0["params"])
    g1 = jax.grad(mkloss(m1))(v0["params"])
    # noise floor: plain vs whole-forward jax.checkpoint measures ~0.05 on
    # this exact setup (f32 recompute reordering through 50+ train-mode BNs)
    assert _grad_rel_l2(g0, g1) < 0.05


def test_parse_remat_blocks():
    from octave_tpu.train.trainer import _parse_remat_blocks

    assert _parse_remat_blocks("block") is True
    assert _parse_remat_blocks("block-enc") == "encoder"
    assert _parse_remat_blocks("block:012") == frozenset({0, 1, 2})
    assert _parse_remat_blocks("block:4") == frozenset({4})
    assert _parse_remat_blocks(False) is False
    assert _parse_remat_blocks(True) is False  # step-level remat, no model wiring
    assert _parse_remat_blocks("conv") is False
    assert _parse_remat_blocks("block+conv") is True
    assert _parse_remat_blocks("block:034+conv") == frozenset({0, 3, 4})
    with pytest.raises(ValueError):
        _parse_remat_blocks("block:")
    with pytest.raises(ValueError):
        _parse_remat_blocks("block:05")
    with pytest.raises(ValueError):
        _parse_remat_blocks("blockx")

    from octave_tpu.train.trainer import _remat_saves_convs

    assert _remat_saves_convs("block+conv") is True
    assert _remat_saves_convs("block:012+conv") is True
    assert _remat_saves_convs("block") is False
    assert _remat_saves_convs("conv") is False
    assert _remat_saves_convs(False) is False


def test_decoder_remat_save_convs_bit_exact():
    """The save-conv-outputs policy inside a remat region changes WHAT the
    backward recomputes, never the values: forward and grads stay exactly
    equal to the plain decoder."""
    d0 = ResNestDecoder(128, 64)
    d1 = nn.remat(
        ResNestDecoder, static_argnums=(2,),
        policy=jax.checkpoint_policies.save_only_these_names("conv_out"),
    )(128, 64)
    rng = np.random.default_rng(2)
    inp = (
        jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 64)), jnp.float32),
        jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 64)), jnp.float32),
    )
    v = d0.init(jax.random.PRNGKey(0), inp, True)
    o0, _ = d0.apply(v, inp, True, mutable=["batch_stats"])
    o1, _ = d1.apply(v, inp, True, mutable=["batch_stats"])
    assert bool(jnp.all(o0 == o1))

    def loss(d, p):
        out, _ = d.apply({**v, "params": p}, inp, True, mutable=["batch_stats"])
        return (out**2).sum()

    g0 = jax.grad(lambda p: loss(d0, p))(v["params"])
    g1 = jax.grad(lambda p: loss(d1, p))(v["params"])
    assert jax.tree.all(jax.tree.map(lambda a, b: bool(jnp.all(a == b)), g0, g1))


def test_parse_remat_enc_layers():
    from octave_tpu.train.trainer import _parse_remat_blocks, _parse_remat_enc_layers

    assert _parse_remat_enc_layers("block") is True
    assert _parse_remat_enc_layers("block:012") is True
    assert _parse_remat_enc_layers("block:012e12") == frozenset({1, 2})
    assert _parse_remat_enc_layers("block:01234e34+conv") == frozenset({3, 4})
    assert _parse_remat_enc_layers(False) is True
    assert _parse_remat_blocks("block:012e12") == frozenset({0, 1, 2})
    assert _parse_remat_blocks("block:01234e34+conv") == frozenset({0, 1, 2, 3, 4})
    with pytest.raises(ValueError):
        _parse_remat_enc_layers("block:012e05")
    with pytest.raises(ValueError):
        _parse_remat_enc_layers("block:012e")
    with pytest.raises(ValueError):
        _parse_remat_blocks("block:e12")  # empty decoder part


@pytest.mark.slow
def test_unet_remat_enc_layer_subset_equivalent():
    """remat_enc_layers as a layer-index set: same param tree, same forward
    values; encoder layers outside the set keep plain Bottlenecks."""
    m0 = ResnestUNet(num_classes=2, remat_blocks=True)
    m1 = ResnestUNet(num_classes=2, remat_blocks=True,
                     remat_enc_layers=frozenset({1, 2}))
    x = jnp.asarray(
        np.random.default_rng(3).uniform(0, 1, (1, 32, 32, 3)), jnp.float32
    )
    v0 = m0.init(jax.random.PRNGKey(0), x, True)
    assert jax.tree.structure(v0) == jax.tree.structure(
        m1.init(jax.random.PRNGKey(0), x, True)
    )
    (a0, agg0, _), _ = m0.apply(v0, x, True, mutable=["batch_stats"])
    (a1, agg1, _), _ = m1.apply(v0, x, True, mutable=["batch_stats"])
    assert bool(jnp.all(agg0 == agg1))
    for p0, p1 in zip(a0, a1):
        assert bool(jnp.all(p0 == p1))


@pytest.mark.slow
def test_unet_remat_stage_subset_equivalent():
    """remat_blocks as a stage-index set: same param tree, same forward
    values (nn.remat is value-preserving), decoder stages outside the set
    stay un-remated."""
    m0 = ResnestUNet(num_classes=2, remat_blocks="encoder")
    m1 = ResnestUNet(num_classes=2, remat_blocks=frozenset({0, 1, 2}))
    x = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (1, 32, 32, 3)), jnp.float32
    )
    v0 = m0.init(jax.random.PRNGKey(0), x, True)
    assert jax.tree.structure(v0) == jax.tree.structure(
        m1.init(jax.random.PRNGKey(0), x, True)
    )
    (a0, agg0, _), _ = m0.apply(v0, x, True, mutable=["batch_stats"])
    (a1, agg1, _), _ = m1.apply(v0, x, True, mutable=["batch_stats"])
    assert bool(jnp.all(agg0 == agg1))
    for p0, p1 in zip(a0, a1):
        assert bool(jnp.all(p0 == p1))


@pytest.mark.slow
def test_train_step_remat_block_runs():
    from octave_tpu.data.preprocess import (
        mask_pyramid,
        mask_to_onehot,
        scribble_to_onehot,
    )
    from octave_tpu.models.discriminator import DiscriminatorBlock
    from octave_tpu.train.schedule import make_optimizer
    from octave_tpu.train.state import TrainState
    from octave_tpu.train.steps import StepConfig, make_train_step

    hw = 32
    rng = np.random.default_rng(0)
    mask = (rng.uniform(0, 1, (2, hw, hw)) > 0.6).astype(np.int32)
    dense = mask_to_onehot(jnp.asarray(mask), 2)
    batch = {
        "image": jnp.asarray(rng.uniform(0, 1, (2, hw, hw, 3)), jnp.float32),
        "scribble_onehot": scribble_to_onehot(
            jnp.asarray(np.where(rng.uniform(0, 1, (2, hw, hw)) < 0.3, mask + 1, 0)), 2
        ),
        "mask_pyramid": mask_pyramid(dense, 4),
    }
    seg = ResnestUNet(num_classes=2, remat_blocks=True)
    disc = DiscriminatorBlock(input_hw=(hw, hw), depth=4, num_filters=8)
    key = jax.random.PRNGKey(0)
    seg_vars = seg.init(key, batch["image"], True)
    disc_vars = disc.init(
        {"params": key, "noise": key}, list(batch["mask_pyramid"]), True
    )
    state = TrainState.create(
        seg_params=seg_vars["params"], disc_params=disc_vars["params"],
        batch_stats=seg_vars["batch_stats"], spectral=disc_vars["spectral"],
        seg_tx=make_optimizer(1e-3), disc_tx=make_optimizer(1e-4),
        rng=jax.random.PRNGKey(7),
    )
    cfg = StepConfig(num_classes=2, use_discriminator=True,
                     discriminator_depth=4, remat="block",
                     compute_dtype="bfloat16")
    step = jax.jit(make_train_step(seg, disc, cfg), donate_argnums=(0,))
    state, losses = step(state, batch)
    assert int(state.step) == 1
    assert all(bool(jnp.isfinite(v)) for v in losses.values())
