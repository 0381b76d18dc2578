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
    for p1, p8 in zip(jax.tree.leaves(s1.seg_params), jax.tree.leaves(s8.seg_params)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=2e-5)
    # sync-BN: running stats identical to full-batch single-device stats
    for b1, b8 in zip(jax.tree.leaves(s1.batch_stats), jax.tree.leaves(s8.batch_stats)):
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b8), atol=1e-5)


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
