"""Pallas kernel (EXPERIMENTAL): patch gather from an HBM-resident slide.

`ops.patches.extract_patches` expresses the crop as vmapped
`dynamic_slice` over a zero-padded slide — XLA lowers that to a gather and
is the **production path**. This kernel drives the grid's input DMA
directly from the *scalar-prefetched* patch centers
(`pltpu.PrefetchScalarGridSpec`): each grid step's BlockSpec index map
reads center i and DMAs a (P+8, P+8, C) window HBM -> VMEM (starts rounded
down to the sublane tile, `pl.multiple_of` carrying the proof), and the
kernel corrects the 0..7-pixel residual in VMEM.

Status: semantics verified in interpret mode (tests); the current Mosaic
toolchain cannot lower 3-channel uint8 VMEM blocks (C pads to 128 lanes and
both unaligned vector loads and `tpu.dynamic_rotate` on (H, W, 3) i8 fail),
so on-TPU this raises at compile time. The XLA gather measures ~0.5 ms per
224² patch from a 4000² slide on v5e — and extraction runs once per section
into the uint8 cache, so it is nowhere near the training hot path. This
file documents the DMA-from-scalar-prefetch pattern for a future toolchain
or a channels-padded layout.
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
