"""Tests for the on-device augmentation and patch-extraction ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mclstexp_tpu.ops import augment, patches


def test_rotate_identity():
    img = jnp.arange(5 * 5 * 3, dtype=jnp.float32).reshape(5, 5, 3) / 75.0
    out = augment.rotate_image(img, jnp.float32(0.0), order=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_rotate_180_matches_flip():
    img = jnp.arange(6 * 6 * 1, dtype=jnp.float32).reshape(6, 6, 1)
    out = np.asarray(augment.rotate_image(img, jnp.float32(180.0), order=0))
    np.testing.assert_allclose(out, np.asarray(img)[::-1, ::-1], atol=1e-5)


def test_rotate_90(rng):
    img = jnp.asarray(rng.normal(size=(8, 8, 3)).astype(np.float32))
    out = np.asarray(augment.rotate_image(img, jnp.float32(90.0), order=0))
    # 90° ccw in image coords == np.rot90 on (H, W)
    np.testing.assert_allclose(out, np.rot90(np.asarray(img), k=1), atol=1e-5)


def test_rotate_shear_matches_direct_at_right_angles(rng):
    img = jnp.asarray(rng.uniform(size=(16, 16, 3)).astype(np.float32))
    for ang in (0.0, 90.0, 180.0, -90.0):
        direct = np.asarray(augment.rotate_image(img, jnp.float32(ang), order=0))
        shear = np.asarray(augment.rotate_image_shear(img, jnp.float32(ang)))
        np.testing.assert_allclose(shear, direct, atol=1e-6)


def test_rotate_shear_arbitrary_angle_is_valid_rotation(rng):
    """Shear rotation must agree with the direct nearest rotation on the
    (large) majority of pixels and preserve the content mass."""
    img = jnp.asarray(rng.uniform(0.2, 1.0, size=(32, 32, 3)).astype(np.float32))
    for ang in (37.0, -120.0, 63.5):
        direct = np.asarray(augment.rotate_image(img, jnp.float32(ang), order=0))
        shear = np.asarray(augment.rotate_image_shear(img, jnp.float32(ang)))
        agree = (np.abs(direct - shear).max(-1) < 1e-6).mean()
        assert agree > 0.55, (ang, agree)
        # same amount of content survives (zero-fill corners match closely)
        assert abs((shear > 0).mean() - (direct > 0).mean()) < 0.05


def test_color_jitter_ranges(rng):
    img = jnp.asarray(rng.uniform(size=(16, 16, 3)).astype(np.float32))
    out = np.asarray(augment.color_jitter(jax.random.PRNGKey(0), img))
    assert out.shape == img.shape
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_train_augment_batch(rng):
    batch = (rng.uniform(size=(4, 16, 16, 3)) * 255).astype(np.uint8)
    out = np.asarray(augment.train_augment(jax.random.PRNGKey(1), jnp.asarray(batch)))
    assert out.shape == (4, 16, 16, 3)
    assert out.dtype == np.float32
    assert out.min() >= 0.0 and out.max() <= 1.0
    # different key -> different augmentation
    out2 = np.asarray(augment.train_augment(jax.random.PRNGKey(2), jnp.asarray(batch)))
    assert not np.allclose(out, out2)


def test_tenx_augment_is_flip_rot_only(rng):
    """tenx augmentation permutes pixels but never changes their values."""
    batch = (rng.uniform(size=(3, 8, 8, 3)) * 255).astype(np.uint8)
    out = np.asarray(augment.tenx_augment(jax.random.PRNGKey(3), jnp.asarray(batch)))
    for i in range(3):
        np.testing.assert_allclose(
            np.sort(out[i].ravel()), np.sort(batch[i].ravel() / 255.0), atol=1e-6
        )


def test_extract_patches_matches_numpy(rng):
    slide = (rng.uniform(size=(40, 50, 3)) * 255).astype(np.uint8)
    centers = np.array([[10, 12], [45, 35], [2, 2]], dtype=np.int32)  # (x, y)
    got = np.asarray(patches.extract_patches(jnp.asarray(slide), jnp.asarray(centers), 8))
    expected = patches.extract_patches_np(slide, centers, 8)
    np.testing.assert_array_equal(got, expected)


def test_extract_patches_border_zero_fill(rng):
    slide = np.full((20, 20, 3), 200, dtype=np.uint8)
    centers = np.array([[0, 0]], dtype=np.int32)
    got = np.asarray(patches.extract_patches(jnp.asarray(slide), jnp.asarray(centers), 8))
    # top-left quadrant comes from outside the slide -> zeros
    assert got[0, 0, 0, 0] == 0
    assert got[0, 7, 7, 0] == 200
