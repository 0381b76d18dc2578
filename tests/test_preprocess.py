"""Device-side preprocessing: scribble/mask encodings, pyramids, the fused
prepare_batch transform, and the synthetic dataset contract."""
import jax.numpy as jnp
import numpy as np
import pytest

from octave_tpu.data.datasets import SyntheticOcta, batch_iterator, skeletonize_to_scribble
from octave_tpu.data.preprocess import (
    grayscale_to_channels,
    mask_pyramid,
    mask_to_onehot,
    normalize_image,
    prepare_batch,
    resize_or_pad,
    scribble_to_onehot,
)


class TestEncodings:
    def test_scribble_onehot_convention(self):
        # 0 = unannotated (all-zero row), 1 = bg scribble → channel 0,
        # 2 = vessel scribble → channel 1
        s = jnp.array([[[0, 1, 2]]])
        oh = scribble_to_onehot(s, 2)
        np.testing.assert_array_equal(
            np.asarray(oh)[0, 0], [[0, 0], [1, 0], [0, 1]]
        )

    def test_mask_onehot(self):
        m = jnp.array([[[0, 1]]])
        oh = mask_to_onehot(m, 2)
        np.testing.assert_array_equal(np.asarray(oh)[0, 0], [[1, 0], [0, 1]])

    def test_pyramid_scales_and_hardness(self, rng):
        m = mask_to_onehot(jnp.asarray((rng.uniform(0, 1, (2, 32, 32)) > 0.5)), 2)
        pyr = mask_pyramid(m, 4)
        assert [p.shape[1] for p in pyr] == [32, 16, 8, 4, 2]
        for p in pyr:  # nearest keeps hard one-hot masks
            vals = np.unique(np.asarray(p))
            assert set(vals) <= {0.0, 1.0}
            np.testing.assert_allclose(np.asarray(p).sum(-1), 1.0)

    def test_avg_pyramid_soft(self, rng):
        m = mask_to_onehot(jnp.asarray((rng.uniform(0, 1, (1, 8, 8)) > 0.5)), 2)
        pyr = mask_pyramid(m, 2, method="avg")
        assert np.asarray(pyr[1]).min() >= 0 and np.asarray(pyr[1]).max() <= 1

    def test_normalize_and_channels(self, rng):
        img8 = rng.integers(0, 256, (2, 16, 16), dtype=np.uint8)
        x = normalize_image(jnp.asarray(img8))
        assert x.shape == (2, 16, 16, 1) and float(x.max()) <= 1.0
        x3 = grayscale_to_channels(x, 3)
        assert x3.shape == (2, 16, 16, 3)
        np.testing.assert_array_equal(np.asarray(x3[..., 0]), np.asarray(x3[..., 2]))

    def test_resize(self, rng):
        x = jnp.asarray(rng.uniform(0, 1, (1, 20, 20, 1)), jnp.float32)
        assert resize_or_pad(x, (32, 32)).shape == (1, 32, 32, 1)
        assert resize_or_pad(x, (20, 20)) is x


class TestPrepareBatch:
    def test_end_to_end_shapes(self, rng):
        img = rng.integers(0, 256, (2, 40, 40), dtype=np.uint8)
        mask = (rng.uniform(0, 1, (2, 40, 40)) > 0.6).astype(np.uint8)
        scrib = np.where(rng.uniform(0, 1, (2, 40, 40)) < 0.2, mask + 1, 0).astype(np.uint8)
        out = prepare_batch(
            jnp.asarray(img), jnp.asarray(scrib), jnp.asarray(mask),
            size=(32, 32), num_classes=2, depth=4, in_channels=3,
        )
        assert out["image"].shape == (2, 32, 32, 3)
        assert out["scribble_onehot"].shape == (2, 32, 32, 2)
        assert out["mask_onehot"].shape == (2, 32, 32, 2)
        assert len(out["mask_pyramid"]) == 5
        assert out["mask_pyramid"][-1].shape == (2, 2, 2, 2)


class TestSynthetic:
    def test_samples_and_iterator(self):
        ds = SyntheticOcta(size=(48, 48), n=5, seed=1)
        s = ds[0]
        assert s.image.shape == (48, 48) and s.image.dtype == np.uint8
        assert set(np.unique(s.mask)) <= {0, 1}
        assert set(np.unique(s.scribble)) <= {0, 1, 2}
        # deterministic per index
        np.testing.assert_array_equal(ds[0].image, SyntheticOcta((48, 48), 5, 1)[0].image)
        batches = list(batch_iterator(ds, 2, epochs=1))
        assert len(batches) == 2  # drop_last
        assert batches[0]["image"].shape == (2, 48, 48)

    def test_scribble_is_sparse_subset(self):
        ds = SyntheticOcta(size=(64, 64), n=2, seed=0)
        s = ds[0]
        vessel_scrib = s.scribble == 2
        assert vessel_scrib.sum() > 0
        assert (vessel_scrib & ~s.mask.astype(bool)).sum() == 0  # on vessels only
        assert vessel_scrib.sum() < s.mask.sum()  # thinner than the mask
