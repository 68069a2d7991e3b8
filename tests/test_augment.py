"""On-device augmentation behavior tests (train/augment.py)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from cut_detection_tpu.train.augment import (
    color_jitter,
    random_affine,
    random_resized_crop,
    simclr_augment,
    simclr_two_views,
)


def _frames(b=4, h=72, w=128):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.random((b, h, w, 3), dtype=np.float32))


def test_random_affine_shapes_and_range():
    x = _frames()
    out = random_affine(jax.random.PRNGKey(0), x)
    assert out.shape == x.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_random_affine_identity_params():
    # degrees=0, translate=0, scale=(1,1) must be an exact no-op.
    x = _frames()
    out = random_affine(jax.random.PRNGKey(0), x, degrees=0.0,
                        translate=(0.0, 0.0), scale=(1.0, 1.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_affine_transform_integer_translation():
    from cut_detection_tpu.train.augment import affine_transform

    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.random((16, 20, 3), dtype=np.float32))
    # Shift content right by 4 pixels: out[y, x] = in[y, x-4].
    out = np.asarray(affine_transform(img, 0.0, (4.0, 0.0), 1.0))
    np.testing.assert_allclose(out[:, 4:], np.asarray(img)[:, :-4], atol=1e-6)
    np.testing.assert_allclose(out[:, :4], 0.0)  # zero fill


def test_affine_transform_180_rotation():
    from cut_detection_tpu.train.augment import affine_transform

    rng = np.random.default_rng(6)
    img = jnp.asarray(rng.random((15, 21, 3), dtype=np.float32))
    out = np.asarray(affine_transform(img, np.pi, (0.0, 0.0), 1.0))
    # 180-degree rotation about the center == flip both spatial axes
    # (odd dims keep the center pixel fixed).
    np.testing.assert_allclose(out, np.asarray(img)[::-1, ::-1], atol=1e-5)


def test_affine_transform_scale_zoom():
    from cut_detection_tpu.train.augment import affine_transform

    # Zoom x2 on a centered bright square: the square's extent doubles.
    img = np.zeros((20, 20, 1), np.float32)
    img[8:12, 8:12] = 1.0
    out = np.asarray(affine_transform(jnp.asarray(img), 0.0, (0.0, 0.0), 2.0))
    assert out.sum() == pytest.approx(4 * img.sum(), rel=0.3)


def test_color_jitter_range_and_variation():
    x = _frames()
    out = color_jitter(jax.random.PRNGKey(1), x)
    assert out.shape == x.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    assert not np.allclose(np.asarray(out), np.asarray(x))


def test_color_jitter_zero_strength_is_identity():
    x = _frames()
    out = color_jitter(jax.random.PRNGKey(1), x, brightness=0.0, contrast=0.0,
                       saturation=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_random_resized_crop_output_size():
    x = _frames(h=90, w=160)
    out = random_resized_crop(jax.random.PRNGKey(2), x, size=(36, 64))
    assert out.shape == (4, 36, 64, 3)


def test_random_resized_crop_full_box_is_resize():
    # scale=(1,1) with the image's own aspect ratio -> whole-image resize.
    x = _frames(h=72, w=128)
    out = random_resized_crop(jax.random.PRNGKey(3), x, size=(72, 128),
                              scale=(1.0, 1.0),
                              ratio=(128 / 72, 128 / 72 + 1e-6))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-2)


def test_simclr_views_differ_and_are_deterministic():
    rng = np.random.default_rng(3)
    x_u8 = jnp.asarray(rng.integers(0, 256, size=(2, 90, 160, 3),
                                    dtype=np.uint8))
    key = jax.random.PRNGKey(7)
    views = simclr_two_views(key, x_u8, size=(36, 64))
    assert views.shape == (4, 36, 64, 3)
    v1, v2 = np.asarray(views[:2]), np.asarray(views[2:])
    assert not np.allclose(v1, v2)  # independent augmentations
    views_again = simclr_two_views(key, x_u8, size=(36, 64))
    np.testing.assert_allclose(np.asarray(views), np.asarray(views_again))


def test_simclr_augment_jit_under_vary_key():
    rng = np.random.default_rng(4)
    x_u8 = jnp.asarray(rng.integers(0, 256, size=(2, 90, 160, 3),
                                    dtype=np.uint8))
    a = simclr_augment(jax.random.PRNGKey(0), x_u8, (36, 64))
    b = simclr_augment(jax.random.PRNGKey(1), x_u8, (36, 64))
    assert not np.allclose(np.asarray(a), np.asarray(b))
