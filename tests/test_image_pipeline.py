"""Image pipeline tests: store loading, augmentation semantics, normalize."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fer_vit_tpu.data.image_pipeline import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    ImageAugmentConfig,
    ImageStore,
    _affine_warp,
    image_augment,
    normalize_images,
)
from fer_vit_tpu.data.splits import stratified_split_indices


def _make_image_tree(tmp_path, n_per=3, size=32):
    from PIL import Image

    from fer_vit_tpu import EMOTION_NAMES

    rng = np.random.default_rng(0)
    for c in EMOTION_NAMES:
        d = tmp_path / c
        d.mkdir()
        for i in range(n_per):
            Image.fromarray(
                rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
            ).save(str(d / f"{i}.png"))
    # one corrupt file → black-image fallback
    (tmp_path / "angry" / "corrupt.png").write_bytes(b"not a png")


class TestImageStore:
    def test_load_and_counts(self, tmp_path):
        _make_image_tree(tmp_path)
        store = ImageStore.load(str(tmp_path), img_size=32)
        assert store.images.shape == (22, 32, 32, 3)  # 21 + 1 corrupt
        assert store.images.dtype == np.uint8
        counts = store.get_class_counts()
        assert counts[0] == 4  # angry has the corrupt extra
        assert all(counts[i] == 3 for i in range(1, 7))
        # corrupt file decoded as black
        assert (store.images.sum(axis=(1, 2, 3)) == 0).sum() == 1

    def test_balanced_subset_and_weights(self, tmp_path):
        _make_image_tree(tmp_path, n_per=4)
        store = ImageStore.load(str(tmp_path), img_size=32)
        sub = store.subset(store.balanced_subset_indices(0.5))
        assert all(v in (2, 3) for v in sub.get_class_counts().values())
        w = store.class_weights()
        assert w.shape == (7,)


class TestNormalize:
    def test_imagenet_stats(self):
        x = jnp.full((1, 8, 8, 3), 255, jnp.uint8)
        out = np.asarray(normalize_images(x))
        np.testing.assert_allclose(
            out[0, 0, 0], (1.0 - IMAGENET_MEAN) / IMAGENET_STD, rtol=1e-5
        )

    def test_resize(self):
        x = jnp.zeros((2, 16, 16, 3), jnp.uint8)
        out = normalize_images(x, out_size=32)
        assert out.shape == (2, 32, 32, 3)


class TestAffineWarp:
    def test_identity(self):
        x = jnp.asarray(
            np.random.default_rng(0).uniform(size=(2, 16, 16, 3)), jnp.float32
        )
        out = _affine_warp(x, jnp.zeros(2), jnp.zeros(2), jnp.zeros(2),
                           jnp.ones(2))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                                   rtol=1e-5, atol=1e-5)

    def test_translation_shifts(self):
        x = np.zeros((1, 9, 9, 1), np.float32)
        x[0, 4, 4, 0] = 1.0
        out = np.asarray(
            _affine_warp(jnp.asarray(x), jnp.zeros(1),
                         jnp.asarray([2.0]), jnp.asarray([0.0]), jnp.ones(1))
        )
        assert out[0, 4, 6, 0] == pytest.approx(1.0, abs=1e-5)

    def test_rotation_90(self):
        x = np.zeros((1, 9, 9, 1), np.float32)
        x[0, 4, 7, 0] = 1.0  # point to the right of center
        angle = jnp.asarray([np.pi / 2])
        out = np.asarray(
            _affine_warp(jnp.asarray(x), angle, jnp.zeros(1), jnp.zeros(1),
                         jnp.ones(1))
        )
        # 90° rotation maps the rightward point onto the vertical axis
        assert out[0, :, 4, :].max() == pytest.approx(1.0, abs=1e-4)


class TestImageAugment:
    def test_output_normalized_and_jittable(self):
        x = jnp.asarray(
            np.random.default_rng(0).integers(0, 255, size=(4, 32, 32, 3)),
            jnp.uint8,
        )
        fn = jax.jit(lambda k, x: image_augment(k, x, ImageAugmentConfig()))
        out = fn(jax.random.key(0), x)
        assert out.shape == (4, 32, 32, 3)
        assert out.dtype == jnp.float32
        assert bool(jnp.isfinite(out).all())

    def test_different_keys_differ(self):
        x = jnp.asarray(
            np.random.default_rng(0).integers(0, 255, size=(2, 32, 32, 3)),
            jnp.uint8,
        )
        a = image_augment(jax.random.key(0), x, ImageAugmentConfig())
        b = image_augment(jax.random.key(1), x, ImageAugmentConfig())
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestStratifiedSplit:
    def test_proportions_and_disjoint(self):
        labels = np.repeat(np.arange(7), [70, 30, 10, 25, 25, 20, 20])
        tr, va = stratified_split_indices(labels, val_fraction=0.2, seed=0)
        assert len(set(tr) & set(va)) == 0
        assert len(tr) + len(va) == len(labels)
        for c, n in zip(range(7), [70, 30, 10, 25, 25, 20, 20]):
            n_val = (labels[va] == c).sum()
            assert n_val == round(n * 0.2)
