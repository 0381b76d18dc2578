"""Distributed-without-a-cluster tests (SURVEY.md §4): an 8-virtual-device
CPU mesh validates batch sharding, gradient pmean, and sync-BN statistics
against the single-device step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octave_tpu.data.preprocess import mask_pyramid, mask_to_onehot, scribble_to_onehot
from octave_tpu.models.discriminator import DiscriminatorBlock
from octave_tpu.models.segmentor import ResnestUNet
from octave_tpu.parallel.mesh import (
    DATA_AXIS,
    make_mesh,
    make_parallel_train_step,
    replicate,
    shard_batch,
)
from octave_tpu.train.schedule import make_optimizer
from octave_tpu.train.state import TrainState
from octave_tpu.train.steps import StepConfig, make_train_step

HW = 32
NDEV = 8


def _batch(rng, b):
    img = rng.uniform(0, 1, (b, HW, HW, 3)).astype(np.float32)
    mask = (rng.uniform(0, 1, (b, HW, HW)) > 0.6).astype(np.int32)
    scrib_map = np.where(rng.uniform(0, 1, (b, HW, HW)) < 0.3, mask + 1, 0)
    dense = mask_to_onehot(jnp.asarray(mask), 2)
    return {
        "image": jnp.asarray(img),
        "scribble_onehot": scribble_to_onehot(jnp.asarray(scrib_map), 2),
        "mask_pyramid": mask_pyramid(dense, 4),
    }


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == NDEV


def test_syncbn_grad_exact_fp64():
    """Sharded grads == full-batch grads to machine epsilon in float64:
    proves the sync-BN (pmean statistics) + grad-pmean semantics are exact,
    not just approximately DDP-like."""
    import flax.linen as nn
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from octave_tpu.models.resnest import Conv
    from octave_tpu.ops.norm import BatchNorm

    jax.config.update("jax_enable_x64", True)
    try:
        class Toy(nn.Module):
            axis: str = None

            @nn.compact
            def __call__(self, x, train=True):
                x = Conv(8, 3, 1, 1, name="c1")(x)
                x = BatchNorm(8, axis_name=self.axis, name="b1")(x, train)
                x = nn.relu(x)
                x = Conv(4, 3, 2, 1, name="c2")(x)
                x = BatchNorm(4, axis_name=self.axis, name="b2")(x, train)
                return x

        rng = np.random.default_rng(0)
        xb = jnp.asarray(rng.standard_normal((8, 8, 8, 3)))
        tgt = jnp.asarray(rng.standard_normal((8, 4, 4, 4)))

        m1 = Toy()
        v = jax.tree.map(
            lambda a: a.astype(jnp.float64), m1.init(jax.random.PRNGKey(0), xb[:1])
        )

        def loss1(p):
            out, _ = m1.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, xb, True,
                mutable=["batch_stats"],
            )
            return jnp.mean((out - tgt) ** 2), None

        g1 = jax.grad(loss1, has_aux=True)(v["params"])[0]

        mesh = Mesh(np.array(jax.devices()), ("data",))
        m8 = Toy(axis="data")

        def shard_loss(p, x, t):
            def f(pp):
                out, _ = m8.apply(
                    {"params": pp, "batch_stats": v["batch_stats"]}, x, True,
                    mutable=["batch_stats"],
                )
                return jnp.mean((out - t) ** 2), None

            g, _ = jax.grad(f, has_aux=True)(p)
            return jax.lax.pmean(g, "data")

        g8 = jax.jit(
            shard_map(shard_loss, mesh=mesh, in_specs=(P(), P("data"), P("data")),
                      out_specs=P(), check_vma=False)
        )(v["params"], xb, tgt)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
            assert float(jnp.abs(a - b).max()) < 1e-12
    finally:
        jax.config.update("jax_enable_x64", False)


def test_full_step_machinery_exact_fp64():
    """The COMPLETE train-step machinery (WPCE with psum'd class counts, ILD,
    max/avg pooling, AAG, sync-BN, grad pmean, SGD) gives machine-epsilon
    identical results sharded vs full-batch in float64 — the exactness proof
    behind the fp32 full-model test below."""
    import flax.linen as nn
    import optax

    from octave_tpu.models.resnest import Conv
    from octave_tpu.models.segmentor import AdversarialAttentionGate
    from octave_tpu.ops.common import avg_pool2d, max_pool2d
    from octave_tpu.ops.norm import BatchNorm

    jax.config.update("jax_enable_x64", True)
    try:
        class ToySeg(nn.Module):
            axis: str = None

            @nn.compact
            def __call__(self, x, train=True):
                x = Conv(8, 3, 1, 1, name="c1")(x)
                x = BatchNorm(8, axis_name=self.axis, name="b1")(x, train)
                x = nn.relu(x)
                h = max_pool2d(x, 3, 2, 1)
                h = Conv(8, 3, 1, 1, name="c2")(h)
                h = BatchNorm(8, axis_name=self.axis, name="b2")(h, train)
                h = avg_pool2d(h, 3, 1, 1)
                h, y1 = AdversarialAttentionGate(8, 2, name="aag1")(h)
                up = jnp.repeat(jnp.repeat(h, 2, 1), 2, 2)
                up = Conv(8, 3, 1, 1, name="c3")(up)
                d0, y0 = AdversarialAttentionGate(8, 2, name="aag0")(up)
                agg = Conv(2, 1, 1, 0, name="fc")(d0)
                return (y0, y1), agg, h

        rng = np.random.default_rng(0)
        hw, b = 16, 8
        img = jnp.asarray(rng.uniform(0, 1, (b, hw, hw, 3)))
        mask = (rng.uniform(0, 1, (b, hw, hw)) > 0.6).astype(np.int64)
        scrib = jnp.asarray(np.where(rng.uniform(0, 1, (b, hw, hw)) < 0.3, mask + 1, 0))
        batch = {
            "image": img,
            "scribble_onehot": scribble_to_onehot(scrib, 2).astype(jnp.float64),
        }

        seg1 = ToySeg()
        v = jax.tree.map(
            lambda a: a.astype(jnp.float64)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            seg1.init(jax.random.PRNGKey(0), img[:1]),
        )
        tx = optax.sgd(0.1)
        st1 = TrainState.create(seg_params=v["params"], batch_stats=v["batch_stats"],
                                seg_tx=tx, rng=jax.random.PRNGKey(7))
        s1, l1 = jax.jit(make_train_step(seg1, None, StepConfig(
            num_classes=2, use_discriminator=False)))(st1, batch)

        mesh = make_mesh()
        seg8 = ToySeg(axis=DATA_AXIS)
        st8 = TrainState.create(seg_params=v["params"], batch_stats=v["batch_stats"],
                                seg_tx=tx, rng=jax.random.PRNGKey(7))
        st8 = replicate(st8, mesh)
        pstep = make_parallel_train_step(make_train_step(seg8, None, StepConfig(
            num_classes=2, use_discriminator=False, axis_name=DATA_AXIS)), mesh)
        s8, l8 = pstep(st8, shard_batch(batch, mesh))

        assert abs(float(l1["loss_sup"]) - float(l8["loss_sup"])) < 1e-14
        assert abs(float(l1["loss_ild"]) - float(l8["loss_ild"])) < 1e-14
        for a, c in zip(jax.tree.leaves(s1.seg_params), jax.tree.leaves(s8.seg_params)):
            assert float(jnp.abs(a - c).max()) < 1e-13
        for a, c in zip(jax.tree.leaves(s1.batch_stats), jax.tree.leaves(s8.batch_stats)):
            assert float(jnp.abs(a - c).max()) < 1e-13
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.mark.slow
def test_data_parallel_matches_single_device():
    """No-noise GAN-free config: 8-way sharded grads psum to the same update
    as the full batch on one device (sync BN makes stats identical too)."""
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    batch = _batch(rng, NDEV * 1)

    import optax

    # single-device reference. SGD, not Adam: Adam's first-step m/sqrt(v) is
    # sign-like, so fp32 reduction-order noise between the 8-way psum and the
    # single-device sum would flip near-zero updates by ±lr — SGD keeps the
    # comparison about sharding semantics, not optimizer conditioning.
    seg1 = ResnestUNet(num_classes=2)
    key = jax.random.PRNGKey(0)
    v1 = seg1.init(key, batch["image"], True)
    # host snapshot: the parallel step donates its state, and on CPU
    # device_put can alias, so v1's buffers may be consumed
    p0_leaves = [np.asarray(p).copy() for p in jax.tree.leaves(v1["params"])]
    tx = optax.sgd(0.1)
    st1 = TrainState.create(seg_params=v1["params"], batch_stats=v1["batch_stats"],
                            seg_tx=tx, rng=jax.random.PRNGKey(7))
    cfg1 = StepConfig(num_classes=2, use_discriminator=False)
    s1, l1 = jax.jit(make_train_step(seg1, None, cfg1))(st1, batch)

    # 8-device sharded
    seg8 = ResnestUNet(num_classes=2, bn_axis_name=DATA_AXIS)
    st8 = TrainState.create(seg_params=v1["params"], batch_stats=v1["batch_stats"],
                            seg_tx=tx, rng=jax.random.PRNGKey(7))
    st8 = replicate(st8, mesh)
    cfg8 = StepConfig(num_classes=2, use_discriminator=False, axis_name=DATA_AXIS)
    pstep = make_parallel_train_step(make_train_step(seg8, None, cfg8), mesh)
    s8, l8 = pstep(st8, shard_batch(batch, mesh))

    assert abs(float(l1["loss_sup"]) - float(l8["loss_sup"])) < 1e-5
    # Exact (machine-epsilon) sharded==full-batch equivalence is proven in
    # float64 by test_full_step_machinery_exact_fp64; at fp32 through
    # ResNeSt-50's ~50 BN layers, reduction-order noise amplifies on
    # individual elements, so the full model is held to an update-direction
    # criterion instead of elementwise equality.
    num = 0.0
    den = 0.0
    for p0, p1, p8 in zip(
        p0_leaves,
        jax.tree.leaves(s1.seg_params),
        jax.tree.leaves(s8.seg_params),
    ):
        u1 = np.asarray(p1) - p0
        u8 = np.asarray(p8) - p0
        num += float(np.sum((u1 - u8) ** 2))
        den += float(np.sum(u1**2))
    rel = (num / max(den, 1e-30)) ** 0.5
    assert rel < 0.10, f"relative update divergence {rel:.4f}"  # fp32 depth noise; exactness proven in fp64
    for b1, b8 in zip(jax.tree.leaves(s1.batch_stats), jax.tree.leaves(s8.batch_stats)):
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b8), rtol=3e-3, atol=1e-3)


@pytest.mark.slow
def test_adversarial_parallel_step_runs():
    """Full GAN step over the mesh: finite losses, state advances."""
    mesh = make_mesh()
    rng = np.random.default_rng(1)
    batch = _batch(rng, NDEV)

    seg = ResnestUNet(num_classes=2, bn_axis_name=DATA_AXIS)
    disc = DiscriminatorBlock(input_hw=(HW, HW), depth=4, num_filters=8)
    key = jax.random.PRNGKey(0)
    seg_vars = seg.init(key, batch["image"][:1], False)
    disc_vars = disc.init({"params": key, "noise": key},
                          [p[:1] for p in batch["mask_pyramid"]], False)
    st = TrainState.create(
        seg_params=seg_vars["params"], disc_params=disc_vars["params"],
        batch_stats=seg_vars["batch_stats"], spectral=disc_vars["spectral"],
        seg_tx=make_optimizer(1e-3), disc_tx=make_optimizer(1e-4),
        rng=jax.random.PRNGKey(3),
    )
    st = replicate(st, mesh)
    cfg = StepConfig(num_classes=2, use_discriminator=True, discriminator_depth=4,
                     axis_name=DATA_AXIS)
    pstep = make_parallel_train_step(make_train_step(seg, disc, cfg), mesh)
    s1, losses = pstep(st, shard_batch(batch, mesh))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert int(s1.step) == 1


def test_mesh_eval_accumulators_match_single_device():
    """Dataset-level eval under the mesh == single-device eval, exactly,
    on an uneven-difficulty synthetic set WITH a ragged tail batch
    (zero-weight padding). Kills the old per-batch-metric-mean fallback
    (VERDICT r1 item 4)."""
    from octave_tpu.parallel.mesh import make_parallel_eval_accumulate_step
    from octave_tpu.utils.metrics import AucAccumulator, ConfusionAccumulator

    mesh = make_mesh()
    rng = np.random.default_rng(3)

    # stand-in "model": prob = clip(image mean-ish channel * scale); the
    # machinery under test (weighted accumulators + psum) is model-agnostic
    def acc_step(params, stats, batch):
        prob = jnp.clip(batch["image"][..., 0] * params["scale"], 0.0, 1.0)
        target = batch["mask_onehot"][..., 1]
        hard = (prob >= 0.5).astype(jnp.float32)
        w = batch.get("sample_weight")
        conf = ConfusionAccumulator.empty().update(hard, target, w)
        auc = AucAccumulator.empty().update(prob, target, w)
        return prob, conf, auc

    params = {"scale": jnp.asarray(1.3)}
    pacc = make_parallel_eval_accumulate_step(acc_step, mesh)

    # 3 batches: two full (8), one ragged tail (5) — unequal difficulty per
    # batch (different vessel densities) so a per-batch mean would be biased
    sizes = [8, 8, 5]
    densities = [0.1, 0.6, 0.35]
    conf_s = ConfusionAccumulator.empty()
    auc_s = AucAccumulator.empty()
    conf_m = ConfusionAccumulator.empty()
    auc_m = AucAccumulator.empty()
    for b, dens in zip(sizes, densities):
        img = rng.uniform(0, 1, (b, HW, HW, 3)).astype(np.float32)
        tgt = (rng.uniform(0, 1, (b, HW, HW)) < dens).astype(np.float32)
        onehot = np.stack([1 - tgt, tgt], axis=-1)
        batch = {"image": jnp.asarray(img), "mask_onehot": jnp.asarray(onehot)}

        # single device, no padding
        _, c, a = jax.jit(acc_step)(params, None, batch)
        conf_s = ConfusionAccumulator(*(x + y for x, y in zip(conf_s, c)))
        auc_s = AucAccumulator(*(x + y for x, y in zip(auc_s, a)))

        # mesh: pad ragged tail with zero-weight repeats of the last sample
        pad = (-b) % NDEV
        weight = np.ones((b + pad,), np.float32)
        if pad:
            weight[b:] = 0.0
            batch = {
                k: jnp.concatenate([v, jnp.repeat(v[-1:], pad, axis=0)])
                for k, v in batch.items()
            }
        batch["sample_weight"] = jnp.asarray(weight)
        c, a = pacc(params, None, shard_batch(batch, mesh))
        conf_m = ConfusionAccumulator(*(x + y for x, y in zip(conf_m, c)))
        auc_m = AucAccumulator(*(x + y for x, y in zip(auc_m, a)))

    for xs, xm in zip(conf_s, conf_m):
        np.testing.assert_allclose(np.asarray(xm), np.asarray(xs), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(auc_m.pos_hist), np.asarray(auc_s.pos_hist), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(auc_m.neg_hist), np.asarray(auc_s.neg_hist), rtol=1e-6)
    assert abs(float(conf_m.dice()) - float(conf_s.dice())) < 1e-6
    assert abs(float(auc_m.auc()) - float(auc_s.auc())) < 1e-6
