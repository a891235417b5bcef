"""Patch extraction from whole-slide images.

The reference crops a 224x224 PIL patch around each spot's pixel center at
``__getitem__`` time, every epoch (reference ``dataset.py:224``,
``dataset.py:333``). Here patches are cut **once** per section — either
on-device from an HBM-resident slide via vmapped ``dynamic_slice``, or on the
host into a uint8 cache array — and training consumes the cache directly.

Edge semantics: PIL ``crop`` zero-pads when the box crosses the image border;
the NumPy slicing in TenxDataset instead yields a short patch (a latent bug
for border spots). We implement zero-padding uniformly.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("patch_size",))
def extract_patches(
    slide: jax.Array, centers: jax.Array, patch_size: int = 224
) -> jax.Array:
    """Cut (N, P, P, C) patches around integer (x, y) pixel centers.

    slide: (H, W, C) uint8; centers: (N, 2) int32 in (x, y) order, matching
    the reference's ``crop((x - r, y - r, x + r, y + r))`` with r = P // 2.
    Out-of-bounds regions are zero-filled (PIL crop semantics).
    """
    r = patch_size // 2
    c = slide.shape[2]
    # Zero-pad by a FULL patch per side so every reachable start is
    # in-bounds even for centers outside the image: dynamic_slice CLAMPS
    # out-of-range starts, and with only r of padding a negative coordinate
    # clamped to 0 silently returned a shifted patch instead of the
    # documented PIL zero-fill (round-4 review finding). With P of padding,
    # partial overlaps land exactly, and fully-outside centers clamp into
    # pure pad — all-zero, matching extract_patches_np for any center.
    padded = jnp.pad(slide, ((patch_size, patch_size), (patch_size, patch_size), (0, 0)))

    def one(center):
        x, y = center[0], center[1]
        # top-left of the patch in padded coords: (coord - r) + P = coord + r
        return jax.lax.dynamic_slice(
            padded,
            (y.astype(jnp.int32) + r, x.astype(jnp.int32) + r, jnp.int32(0)),
            (patch_size, patch_size, c),
        )

    return jax.vmap(one)(centers)


def extract_patches_np(
    slide: np.ndarray, centers: np.ndarray, patch_size: int = 224
) -> np.ndarray:
    """Host-side patch cutter for cache building (uint8 in, uint8 out)."""
    r = patch_size // 2
    h, w = slide.shape[:2]
    c = slide.shape[2] if slide.ndim == 3 else 1
    out = np.zeros((len(centers), patch_size, patch_size, c), dtype=slide.dtype)
    for i, (x, y) in enumerate(np.asarray(centers, dtype=np.int64)):
        y0, y1 = y - r, y + r
        x0, x1 = x - r, x + r
        sy0, sy1 = max(y0, 0), min(y1, h)
        sx0, sx1 = max(x0, 0), min(x1, w)
        if sy1 > sy0 and sx1 > sx0:
            out[i, sy0 - y0 : sy1 - y0, sx0 - x0 : sx1 - x0] = slide[sy0:sy1, sx0:sx1]
    return out
