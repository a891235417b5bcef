"""Embedding dump: run every section through both towers of one checkpoint.

Reference phase A (``evel_her2st.py:30-71,87-117``): all sections are
concatenated, batched sequentially at B=32, and pushed through the image
tower and the spot tower — the spot tower sees *each batch as one sequence*,
so batch boundaries (including ones straddling two sections) are part of
the model's effective input. That batching is reproduced exactly; the
compute itself is a single jitted program per batch shape (two shapes: 32
and the final remainder).

Output layout matches the reference for drop-in compatibility:
``<out_dir>/img_embeddings_<i+1>.npy`` and ``spot_embeddings_<i+1>.npy``,
stored transposed (P, N_i) per section (``evel_her2st.py:109-117``).
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import numpy as np

from mclstexp_tpu.data.pipeline import ConcatSections, eval_batches
from mclstexp_tpu.data.section import Section
from mclstexp_tpu.models.mclstexp import MclSTExp


def compute_embeddings(
    model: MclSTExp,
    params,
    batch_stats,
    sections: Sequence[Section],
    batch_size: int = 32,
    eval_augment: bool = False,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """(image_embeddings, spot_embeddings), each (sum N_i, P), section order
    preserved. Batches of `batch_size` cross section boundaries (parity).

    eval_augment applies the Visium inference-time random flips/rotations
    quirk (seeded; reference ``dataset.py:316-325``)."""
    import jax
    import jax.numpy as jnp

    data = ConcatSections.from_sections(sections)
    rng = jax.random.PRNGKey(seed)

    # Spot tower at exactly `batch_size` (each batch is one attention
    # sequence — parity-load-bearing). The image tower is per-spot
    # independent at eval, so it runs at a large batch for MXU utilization;
    # its outputs are bitwise independent of batching (BN in inference mode).
    @jax.jit
    def spot_fn(params, batch_stats, expression, position):
        variables = {"params": params, "batch_stats": batch_stats}
        return model.apply(
            variables, expression, position, method=type(model).encode_spots
        )

    @jax.jit
    def image_fn(params, batch_stats, images):
        variables = {"params": params, "batch_stats": batch_stats}
        return model.apply(variables, images, method=type(model).encode_image)

    if eval_augment:
        from mclstexp_tpu.ops.augment import tenx_augment

    img_out, spot_out = [], []
    image_bs = max(batch_size, 256)
    for i, batch in enumerate(eval_batches(data, image_bs)):
        if eval_augment:
            images = tenx_augment(jax.random.fold_in(rng, i), jnp.asarray(batch["image_u8"]))
        else:
            images = jnp.asarray(batch["image_u8"]).astype(jnp.float32) / 255.0
        img_out.append(np.asarray(image_fn(params, batch_stats, images)))
    for batch in eval_batches(data, batch_size):
        spot_out.append(
            np.asarray(
                spot_fn(
                    params, batch_stats,
                    jnp.asarray(batch["expression"]), jnp.asarray(batch["position"]),
                )
            )
        )
    return np.concatenate(img_out, axis=0), np.concatenate(spot_out, axis=0)


def split_by_section(
    embeddings: np.ndarray, section_sizes: Sequence[int]
) -> List[np.ndarray]:
    out, start = [], 0
    for n in section_sizes:
        out.append(embeddings[start : start + n])
        start += n
    assert start == len(embeddings)
    return out


def dump_embeddings(
    model: MclSTExp,
    params,
    batch_stats,
    sections: Sequence[Section],
    out_dir: str,
    batch_size: int = 32,
    eval_augment: bool = False,
) -> None:
    """Write the reference-compatible per-section transposed .npy files."""
    img, spot = compute_embeddings(
        model, params, batch_stats, sections, batch_size, eval_augment
    )
    sizes = [s.num_spots for s in sections]
    os.makedirs(out_dir, exist_ok=True)
    for i, (im, sp) in enumerate(
        zip(split_by_section(img, sizes), split_by_section(spot, sizes))
    ):
        np.save(os.path.join(out_dir, f"img_embeddings_{i + 1}.npy"), im.T)
        np.save(os.path.join(out_dir, f"spot_embeddings_{i + 1}.npy"), sp.T)
