"""Pallas patch-gather kernel vs the NumPy golden (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mclstexp_tpu.ops.pallas_patches import (
    extract_patches_pallas,
    extract_patches_pallas_bytes,
)
from mclstexp_tpu.ops.patches import extract_patches_np


def test_pallas_patches_match_numpy(rng):
    slide = rng.integers(0, 255, size=(60, 80, 3), endpoint=False).astype(np.uint8)
    centers = np.array([[10, 12], [70, 50], [40, 30], [3, 3]], dtype=np.int32)
    got = np.asarray(
        extract_patches_pallas(jnp.asarray(slide), jnp.asarray(centers), 16, interpret=True)
    )
    expected = extract_patches_np(slide, centers, 16)
    np.testing.assert_array_equal(got, expected)


def test_pallas_bytes_kernel_matches_numpy(rng):
    """The byte-layout kernel — the formulation that LOWERS on real TPUs
    (verified bit-exact on v5e; see module docstring) — against the NumPy
    golden, across channel counts and tile-residual-exercising centers."""
    for c, p in ((3, 16), (1, 32), (4, 16)):
        slide = rng.integers(0, 255, size=(96, 130, c), endpoint=False).astype(np.uint8)
        centers = np.array(
            [[10, 12], [127, 90], [41, 33], [3, 3], [64, 64]], dtype=np.int32
        )
        got = np.asarray(
            extract_patches_pallas_bytes(
                jnp.asarray(slide), jnp.asarray(centers), p, interpret=True
            )
        )
        expected = extract_patches_np(slide, centers, p)
        np.testing.assert_array_equal(got, expected, err_msg=f"c={c} p={p}")


def test_pallas_patches_border_zero_fill(rng):
    slide = np.full((30, 30, 3), 77, dtype=np.uint8)
    centers = np.array([[0, 0], [29, 29]], dtype=np.int32)
    got = np.asarray(
        extract_patches_pallas(jnp.asarray(slide), jnp.asarray(centers), 8, interpret=True)
    )
    expected = extract_patches_np(slide, centers, 8)
    np.testing.assert_array_equal(got, expected)
