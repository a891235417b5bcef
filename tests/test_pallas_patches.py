"""Pallas patch-gather kernel vs the NumPy golden (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mclstexp_tpu.ops.pallas_patches import extract_patches_pallas
from mclstexp_tpu.ops.patches import extract_patches_np


def test_pallas_patches_match_numpy(rng):
    slide = rng.integers(0, 255, size=(60, 80, 3), endpoint=False).astype(np.uint8)
    centers = np.array([[10, 12], [70, 50], [40, 30], [3, 3]], dtype=np.int32)
    got = np.asarray(
        extract_patches_pallas(jnp.asarray(slide), jnp.asarray(centers), 16, interpret=True)
    )
    expected = extract_patches_np(slide, centers, 16)
    np.testing.assert_array_equal(got, expected)


def test_pallas_patches_border_zero_fill(rng):
    slide = np.full((30, 30, 3), 77, dtype=np.uint8)
    centers = np.array([[0, 0], [29, 29]], dtype=np.int32)
    got = np.asarray(
        extract_patches_pallas(jnp.asarray(slide), jnp.asarray(centers), 8, interpret=True)
    )
    expected = extract_patches_np(slide, centers, 8)
    np.testing.assert_array_equal(got, expected)
