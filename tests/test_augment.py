"""Device-side training augmentation (data/augment.py): geometric
consistency across image/labels, label integrity, pyramid correctness, and
the Trainer wiring. The reference augments off-tree (kornia pinned at
requirements.txt:16); this is the framework-supplied TPU-native equivalent.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from octave_tpu.data import augment as aug
from octave_tpu.data.preprocess import mask_pyramid, prepare_batch


def _delta_batch(b=4, hw=16):
    """Images with a single lit pixel per sample at distinct positions."""
    img = np.zeros((b, hw, hw, 1), np.float32)
    for i in range(b):
        img[i, 1 + (i % (hw - 2)), 2, 0] = 1.0
    return jnp.asarray(img)


class TestDihedral:
    def test_same_transform_applied_to_all_tensors(self):
        x = _delta_batch()
        y = x * 2.0  # same geometry, different values
        xa, ya = aug.random_dihedral(jax.random.PRNGKey(0), x, y)
        np.testing.assert_allclose(np.asarray(ya), 2.0 * np.asarray(xa))
        # mass preserved per sample (pure permutation of pixels)
        np.testing.assert_allclose(
            np.asarray(xa.sum(axis=(1, 2, 3))), np.ones(4), atol=1e-6
        )

    def test_covers_multiple_elements(self):
        x = _delta_batch(b=32)
        (xa,) = aug.random_dihedral(jax.random.PRNGKey(1), x)
        moved = np.asarray((xa != x).any(axis=(1, 2, 3)))
        # with 32 samples and 7/8 non-identity elements, some must move
        assert moved.any()
        # and identity must be possible too over a few keys
        stays = [
            np.asarray(
                (aug.random_dihedral(jax.random.PRNGKey(k), x)[0] == x).all(axis=(1, 2, 3))
            ).any()
            for k in range(4)
        ]
        assert any(stays)

    def test_onehot_preserved(self):
        rng = np.random.default_rng(0)
        labels = rng.integers(0, 2, (3, 8, 8))
        onehot = jnp.asarray(np.eye(2, dtype=np.float32)[labels])
        (a,) = aug.random_dihedral(jax.random.PRNGKey(2), onehot)
        np.testing.assert_allclose(np.asarray(a.sum(-1)), 1.0)
        assert set(np.unique(np.asarray(a))) <= {0.0, 1.0}


class TestIntensity:
    def test_range_and_label_independence(self):
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.uniform(0, 1, (4, 8, 8, 3)), jnp.float32)
        out = aug.intensity_jitter(jax.random.PRNGKey(3), img, 0.2, 0.2)
        o = np.asarray(out)
        assert o.min() >= 0.0 and o.max() <= 1.0
        assert not np.allclose(o, np.asarray(img))


class TestPrepareBatchAugment:
    def test_pyramid_is_pyramid_of_augmented_mask(self):
        rng = np.random.default_rng(2)
        img = rng.uniform(0, 255, (2, 16, 16)).astype(np.uint8)
        mask = rng.integers(0, 2, (2, 16, 16)).astype(np.uint8)
        scrib = rng.integers(0, 3, (2, 16, 16)).astype(np.uint8)
        batch = prepare_batch(
            jnp.asarray(img), jnp.asarray(scrib), jnp.asarray(mask),
            size=(16, 16), depth=2,
            augment_key=jax.random.PRNGKey(4), augment_intensity=0.1,
        )
        expected = mask_pyramid(batch["mask_onehot"], 2)
        for got, exp in zip(batch["mask_pyramid"], expected):
            np.testing.assert_allclose(np.asarray(got), np.asarray(exp))

    def test_no_key_is_identity_of_unaugmented(self):
        rng = np.random.default_rng(3)
        img = rng.uniform(0, 255, (2, 16, 16)).astype(np.uint8)
        mask = rng.integers(0, 2, (2, 16, 16)).astype(np.uint8)
        scrib = rng.integers(0, 3, (2, 16, 16)).astype(np.uint8)
        a = prepare_batch(jnp.asarray(img), jnp.asarray(scrib), jnp.asarray(mask),
                          size=(16, 16), depth=2)
        b = prepare_batch(jnp.asarray(img), jnp.asarray(scrib), jnp.asarray(mask),
                          size=(16, 16), depth=2, augment_key=None)
        np.testing.assert_allclose(np.asarray(a["image"]), np.asarray(b["image"]))


@pytest.mark.slow
def test_trainer_augment_smoke():
    """Two train steps with augmentation on: losses finite, resume-stable
    key seeding doesn't crash."""
    from octave_tpu.train.trainer import Trainer
    from octave_tpu.utils.config import Config

    cfg = Config.from_dict({
        "model": {"discriminator_depth": 4, "num_filters": 8},
        "data": {"dataset": "synthetic", "image_size": (32, 32),
                 "batch_size": 2, "synthetic_n": 4,
                 "augment": True, "augment_intensity": 0.1},
        "train": {"steps": 2, "eval_every": 0, "log_every": 10},
    })
    trainer = Trainer(cfg)
    state = trainer.fit()
    assert int(state.step) == 2


def test_non_square_rot90_raises():
    """Non-square inputs raise instead of silently dropping the rotation
    bit (VERDICT r2 item 10)."""
    import jax

    from octave_tpu.data.augment import random_dihedral

    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 8, 12, 1))
    with pytest.raises(ValueError, match="square"):
        random_dihedral(key, x)


def test_dual_head_scribble_c_rides_the_same_transform():
    """scribble_onehot_c gets the SAME per-sample dihedral transform as the
    image/main targets (prepare_batch extra_labels path)."""
    import jax
    import numpy as np

    from octave_tpu.data.preprocess import prepare_batch

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (4, 16, 16)).astype(np.float32)
    scrib = rng.integers(0, 3, (4, 16, 16)).astype(np.uint8)
    mask = rng.integers(0, 2, (4, 16, 16)).astype(np.uint8)
    batch = prepare_batch(
        jnp.asarray(img), jnp.asarray(scrib), jnp.asarray(mask),
        size=(16, 16), depth=2,
        augment_key=jax.random.PRNGKey(5),
        scribble_c=jnp.asarray(scrib),  # same source as the main scribble
    )
    # identical sources + identical transform => identical one-hots
    np.testing.assert_array_equal(
        np.asarray(batch["scribble_onehot"]), np.asarray(batch["scribble_onehot_c"])
    )
    # and it differs from the un-augmented encoding for at least one sample
    plain = prepare_batch(
        jnp.asarray(img), jnp.asarray(scrib), jnp.asarray(mask),
        size=(16, 16), depth=2,
    )
    assert not np.array_equal(
        np.asarray(batch["scribble_onehot"]), np.asarray(plain["scribble_onehot"])
    )
