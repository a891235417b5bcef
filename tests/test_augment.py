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


def test_rotate_batch_matches_per_image(rng):
    """The batch-level flat-gather rotation must be bit-identical to the
    per-image 2-D gather formulation, including the folded-in hflip."""
    imgs = jnp.asarray(rng.uniform(size=(5, 12, 12, 3)).astype(np.float32))
    angles = jnp.asarray(
        rng.uniform(-180.0, 180.0, size=(5,)).astype(np.float32)
    )
    hflip = jnp.asarray(np.array([True, False, True, True, False]))
    got = np.asarray(augment.rotate_batch(imgs, angles, hflip=hflip, order=0))
    flipped = jnp.where(hflip[:, None, None, None], imgs[:, :, ::-1, :], imgs)
    want = np.asarray(
        jax.vmap(lambda im, a: augment.rotate_image(im, a, 0))(flipped, angles)
    )
    np.testing.assert_array_equal(got, want)


def test_row_shift_matches_numpy(rng):
    from mclstexp_tpu.ops.pallas_shift import row_shift

    x = rng.uniform(size=(2, 16, 16, 3)).astype(np.float32)
    shifts = rng.integers(-7, 8, size=(2, 16)).astype(np.int32)
    got = np.asarray(row_shift(jnp.asarray(x), jnp.asarray(shifts), interpret=True))
    want = np.zeros_like(x)
    for b in range(2):
        for y in range(16):
            k = shifts[b, y]
            for xx in range(16):
                if 0 <= xx - k < 16:
                    want[b, y, xx] = x[b, y, xx - k]
    np.testing.assert_array_equal(got, want)


def test_paeth_exact_at_90_multiples(rng):
    imgs = jnp.asarray(rng.uniform(size=(4, 16, 16, 3)).astype(np.float32))
    for ang in [0.0, 90.0, 180.0, -90.0]:
        angles = jnp.full((4,), ang, jnp.float32)
        got = np.asarray(augment.rotate_batch_paeth(imgs, angles))
        want = np.asarray(augment.rotate_batch(imgs, angles))
        np.testing.assert_allclose(got, want, atol=1e-6, err_msg=f"angle {ang}")


def test_paeth_close_to_exact_nn(rng):
    """On a smooth image the 3-shear resampling stays within a pixel of the
    direct NN rotation, preserves values, and agrees on the zero-fill mask."""
    yy, xx = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    grad = ((yy + xx) / 62.0).astype(np.float32)[None, :, :, None].repeat(3, -1)
    gi = jnp.asarray(np.tile(grad, (3, 1, 1, 1)))
    angles = jnp.asarray(np.array([17.0, -48.0, 133.0], np.float32))
    got = np.asarray(augment.rotate_batch_paeth(gi, angles))
    want = np.asarray(augment.rotate_batch(gi, angles))
    both = (got > 0) & (want > 0)
    assert np.abs(got - want)[both].mean() < 0.03
    assert ((got == 0) == (want == 0)).mean() > 0.95
    for i in range(3):
        assert np.isin(got[i][got[i] > 0], grad[0]).all()


def test_paeth_hflip_folding(rng):
    imgs = jnp.asarray(rng.uniform(size=(3, 16, 16, 3)).astype(np.float32))
    angles = jnp.asarray(np.array([33.0, -71.0, 158.0], np.float32))
    hf = jnp.asarray(np.array([True, False, True]))
    got = np.asarray(augment.rotate_batch_paeth(imgs, angles, hflip=hf))
    flipped = jnp.where(hf[:, None, None, None], imgs[:, :, ::-1, :], imgs)
    want = np.asarray(augment.rotate_batch_paeth(flipped, angles))
    np.testing.assert_array_equal(got, want)


def test_color_jitter_batch_matches_single_image_ops(rng):
    """Batched jitter with a known permutation must equal composing the
    single-image ops in that order (same factors)."""
    imgs = jnp.asarray(rng.uniform(size=(3, 8, 8, 3)).astype(np.float32))
    out = np.asarray(augment.color_jitter_batch(jax.random.PRNGKey(5), imgs))
    assert out.shape == imgs.shape
    assert out.min() >= 0.0 and out.max() <= 1.0
    # different images get different factors
    d0 = np.abs(out[0] - np.asarray(imgs[0])).mean()
    d1 = np.abs(out[1] - np.asarray(imgs[1])).mean()
    assert not np.isclose(d0, d1)


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


def test_channel_major_jitter_matches_channels_last(rng):
    """The channel-major jitter core (TPU lane-occupancy fix, PROFILE_r02.md)
    must be numerically identical to the channels-last composition."""
    imgs = jnp.asarray(rng.uniform(size=(2, 8, 8, 3)).astype(np.float32))
    fb = jnp.full((2, 1, 1, 1), 1.3, jnp.float32)
    fc = jnp.full((2, 1, 1, 1), 0.7, jnp.float32)
    fs = jnp.full((2, 1, 1, 1), 1.1, jnp.float32)
    ops = augment._jitter_ops(fb, fc, fs)
    ops_cm = augment._jitter_ops_cm(fb, fc, fs)
    for p in augment._PERMS:
        want = imgs
        for j in p:
            want = ops[j](want)
        x = jnp.moveaxis(imgs, -1, 1)
        for j in p:
            x = ops_cm[j](x)
        got = jnp.moveaxis(x, 1, -1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)
