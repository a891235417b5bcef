"""Pallas kernels: patch gather from an HBM-resident slide.

`ops.patches.extract_patches` expresses the crop as vmapped
`dynamic_slice` over a zero-padded slide — XLA lowers that to a gather and
is the **production path** (extraction runs once per section into the
uint8 cache, nowhere near the training hot path). These kernels drive the
grid's input DMA directly from the *scalar-prefetched* patch centers
(`pltpu.PrefetchScalarGridSpec`): each grid step's BlockSpec index map
reads center i and DMAs only that patch's window HBM -> VMEM (starts
rounded down to the tile, `pl.multiple_of` carrying the alignment proof),
and the kernel corrects the sub-tile residual in VMEM.

Two formulations:

* `extract_patches_pallas` — the natural 3-D (H, W, C) form. STILL
  non-lowerable: a 3-channel minor axis pads to 128 lanes and Mosaic has
  neither unaligned i8 vector loads nor 3-D i8 `dynamic_rotate`.
  Interpret-mode only; kept as documentation of why the byte layout
  exists.
* `extract_patches_pallas_bytes` — the LOWERABLE form (verified bit-exact
  against the NumPy reference on a real v5e): channels flatten into the
  row so the slide is a tile-aligned 2-D (H, W*C) byte image, every block
  is a natively tiled (32, 128) i8 DMA, and the residual shift upcasts
  the VMEM block to i32 (Mosaic has i32 dynamic rotates), rolls, slices,
  and downcasts. Same wall time as the XLA gather at cache-build scale
  (both transport-bound over the tunnel at ~64 patches).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ALIGN = 8


def _patch_kernel(centers_ref, slide_ref, out_ref):
    i = pl.program_id(0)
    p = out_ref.shape[1]
    ry = centers_ref[i, 1] % _ALIGN
    rx = centers_ref[i, 0] % _ALIGN
    # Residual shift inside VMEM: unaligned vector loads are not lowerable,
    # but dynamic rolls are; roll the residual to the origin, slice aligned.
    block = slide_ref[...]
    block = pltpu.roll(block, -ry, axis=0)
    block = pltpu.roll(block, -rx, axis=1)
    out_ref[0] = block[:p, :p, :]


@functools.partial(jax.jit, static_argnames=("patch_size", "interpret"))
def extract_patches_pallas_prepadded(
    padded_slide: jax.Array,  # (H + P + ALIGN, W + P + ALIGN, C)
    centers: jax.Array,  # (N, 2) int32 (x, y) in *unpadded* coords
    patch_size: int = 224,
    interpret: bool = False,
) -> jax.Array:
    n = centers.shape[0]
    c = padded_slide.shape[-1]
    p = patch_size

    def in_index(i, centers_ref):
        # top-left of patch i in padded coords is (y_i, x_i) (the +r pad
        # cancels the -r of the crop, reference dataset.py:224); round down
        # to the sublane tile and fix the residual inside the kernel.
        y = pl.multiple_of((centers_ref[i, 1] // _ALIGN) * _ALIGN, _ALIGN)
        x = pl.multiple_of((centers_ref[i, 0] // _ALIGN) * _ALIGN, _ALIGN)
        return (y, x, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(p + _ALIGN), pl.Element(p + _ALIGN), pl.Element(c)),
                in_index,
            ),
        ],
        out_specs=pl.BlockSpec((1, p, p, c), lambda i, centers_ref: (i, 0, 0, 0)),
    )
    return pl.pallas_call(
        _patch_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, p, p, c), padded_slide.dtype),
        interpret=interpret,
    )(centers.astype(jnp.int32), padded_slide)


def extract_patches_pallas(
    slide: jax.Array,
    centers: jax.Array,
    patch_size: int = 224,
    interpret: bool = False,
) -> jax.Array:
    """(N, P, P, C) patches around (x, y) centers; zero fill at borders."""
    r = patch_size // 2
    padded = jnp.pad(slide, ((r, r + _ALIGN), (r, r + _ALIGN), (0, 0)))
    return extract_patches_pallas_prepadded(padded, centers, patch_size, interpret)


# ------------------------- byte-layout variant (2-D, channels flattened) --

_ROW_ALIGN = 32  # uint8 sublane tile
_BYTE_ALIGN = 128  # lane tile


def _patch_kernel_bytes(centers_ref, slide_ref, out_ref, *, channels: int):
    i = pl.program_id(0)
    p = out_ref.shape[1]
    ry = centers_ref[i, 1] % _ROW_ALIGN
    rb = (centers_ref[i, 0] * channels) % _BYTE_ALIGN
    # Mosaic has no i8 dynamic rotate (and rolls must be non-negative):
    # upcast the block to i32 in VMEM, roll the residual so element r lands
    # on the tile boundary, slice statically, downcast. VMEM cost: the
    # (P+32, ~P*C+128) block x4 — ~0.9 MB at the 224-px protocol size.
    block = slide_ref[...].astype(jnp.int32)
    block = pltpu.roll(block, _ROW_ALIGN - ry, axis=0)
    block = pltpu.roll(block, _BYTE_ALIGN - rb, axis=1)
    out_ref[0] = block[
        _ROW_ALIGN : _ROW_ALIGN + p, _BYTE_ALIGN : _BYTE_ALIGN + p * channels
    ].astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("patch_size", "channels", "interpret"))
def _extract_patches_bytes_prepadded(
    padded_2d: jax.Array,  # (H + P + ROW_ALIGN, (W + P) * C + BYTE_ALIGN) u8
    centers: jax.Array,
    patch_size: int,
    channels: int,
    interpret: bool = False,
) -> jax.Array:
    n = centers.shape[0]
    p = patch_size
    # Mosaic requires the trailing block dims divisible by (8, 128); round
    # the byte width up to the lane tile (rows p + 32 are already 8-aligned
    # for the protocol sizes).
    block_w = -(-(p * channels + _BYTE_ALIGN) // _BYTE_ALIGN) * _BYTE_ALIGN

    def in_index(i, centers_ref):
        y = pl.multiple_of(
            (centers_ref[i, 1] // _ROW_ALIGN) * _ROW_ALIGN, _ROW_ALIGN
        )
        b = pl.multiple_of(
            ((centers_ref[i, 0] * channels) // _BYTE_ALIGN) * _BYTE_ALIGN,
            _BYTE_ALIGN,
        )
        return (y, b)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(p + _ROW_ALIGN), pl.Element(block_w)),
                in_index,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, p, p * channels), lambda i, centers_ref: (i, 0, 0)
        ),
    )
    kernel = functools.partial(_patch_kernel_bytes, channels=channels)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, p, p * channels), padded_2d.dtype),
        interpret=interpret,
    )(centers.astype(jnp.int32), padded_2d)


def extract_patches_pallas_bytes(
    slide: jax.Array,
    centers: jax.Array,
    patch_size: int = 224,
    interpret: bool = False,
) -> jax.Array:
    """Byte-layout formulation of the scalar-prefetch patch gather.

    The 3-D kernel above cannot lower because a 3-channel minor axis pads
    to 128 lanes and neither unaligned i8 vector loads nor 3-D
    ``dynamic_rotate`` exist in Mosaic. Flattening channels into the row —
    the slide becomes a 2-D (H, W*C) byte image, tile-aligned (32, 128) —
    keeps every DMA and roll on natively tiled 2-D i8 blocks: the index
    map rounds the (row, byte) start down to the tile, the kernel rolls
    the <32-row and <128-byte residuals in VMEM, and the (N, P, P*C)
    output reshapes back to patches for free.
    """
    r = patch_size // 2
    h, w, c = slide.shape
    slide_2d = slide.reshape(h, w * c)
    # Right margins cover the rounded-up block extents: a block starting at
    # the largest tile-aligned origin must stay in bounds.
    block_w = -(-(patch_size * c + _BYTE_ALIGN) // _BYTE_ALIGN) * _BYTE_ALIGN
    padded = jnp.pad(
        slide_2d,
        ((r, r + _ROW_ALIGN), (r * c, r * c + (block_w - patch_size * c))),
    )
    out = _extract_patches_bytes_prepadded(
        padded, centers, patch_size, c, interpret
    )
    return out.reshape(out.shape[0], patch_size, patch_size, c)
