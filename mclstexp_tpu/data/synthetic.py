"""Synthetic spatial-transcriptomics fixtures.

Generates sections whose patch pixels and expression profiles share a latent
structure, so the contrastive objective is learnable end-to-end on CPU in
seconds — the test substrate SURVEY §4 calls for (the reference has no
tests; its eval scripts double as integration tests on real data).

`write_st_layout` additionally materializes the legacy ST file layout
(count TSVs + spot-selection TSVs + slide images) so the real dataset
readers are exercised without any real data.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from mclstexp_tpu.data.normalize import logcpm_panel
from mclstexp_tpu.data.section import Section


def make_section(
    name: str,
    num_spots: int = 64,
    num_genes: int = 32,
    patch_size: int = 32,
    latent_dim: int = 4,
    seed: int = 0,
    gene_loadings: Optional[np.ndarray] = None,
) -> Section:
    """One synthetic section: latent z per spot drives both the patch texture
    and the counts, so image patches are predictive of expression."""
    rng = np.random.default_rng(seed)
    side = int(np.ceil(np.sqrt(num_spots)))
    xs, ys = np.meshgrid(np.arange(side), np.arange(side))
    positions = np.stack([xs.ravel(), ys.ravel()], axis=1)[:num_spots].astype(np.int32)
    centers = (positions * patch_size + patch_size).astype(np.int32)

    z = rng.normal(size=(num_spots, latent_dim))
    if gene_loadings is None:
        gene_loadings = rng.normal(size=(latent_dim, num_genes))
    rates = np.exp(z @ gene_loadings * 0.5 + 1.0)
    counts = rng.poisson(rates).astype(np.float64)
    expression = logcpm_panel(counts)

    # Patch: base color from z[:3], plus a texture frequency from z[3:].
    patches = np.zeros((num_spots, patch_size, patch_size, 3), dtype=np.uint8)
    yy, xx = np.meshgrid(np.arange(patch_size), np.arange(patch_size), indexing="ij")
    for i in range(num_spots):
        base = 128 + 60 * np.tanh(z[i, :3])
        freq = 0.2 + 0.1 * np.tanh(z[i, 3 % latent_dim])
        tex = 30 * np.sin(freq * (xx + yy))[..., None]
        img = np.clip(base[None, None, :] + tex + rng.normal(scale=5, size=(patch_size, patch_size, 3)), 0, 255)
        patches[i] = img.astype(np.uint8)

    return Section(
        name=name,
        expression=expression.astype(np.float32),
        positions=positions,
        centers=centers,
        patches=patches,
        counts=counts.astype(np.float32),
    )


def make_dataset(
    num_sections: int = 3,
    num_spots: int = 64,
    num_genes: int = 32,
    patch_size: int = 32,
    seed: int = 0,
) -> List[Section]:
    """Sections share gene loadings so cross-section retrieval is meaningful."""
    rng = np.random.default_rng(seed)
    loadings = rng.normal(size=(4, num_genes))
    return [
        make_section(
            f"S{i + 1}",
            num_spots=num_spots,
            num_genes=num_genes,
            patch_size=patch_size,
            seed=seed + 100 + i,
            gene_loadings=loadings,
        )
        for i in range(num_sections)
    ]


def write_st_layout(
    root: str,
    num_sections: int = 3,
    num_spots: int = 16,
    num_genes: int = 12,
    seed: int = 0,
) -> Tuple[List[str], List[str]]:
    """Materialize the HER2ST-style on-disk layout with synthetic data:
    ST-cnts/<name>.tsv (spots x genes, index '{x}x{y}'),
    ST-spotfiles/<name>_selection.tsv (x, y, pixel_x, pixel_y),
    ST-imgs/<letter>/<name>/slide.jpg. Returns (section names, gene names).
    """
    import pandas as pd
    from PIL import Image

    rng = np.random.default_rng(seed)
    gene_names = [f"GENE{i}" for i in range(num_genes)]
    names = []
    os.makedirs(os.path.join(root, "ST-cnts"), exist_ok=True)
    os.makedirs(os.path.join(root, "ST-spotfiles"), exist_ok=True)
    for s in range(num_sections):
        name = f"{chr(ord('A') + s)}1"
        names.append(name)
        side = int(np.ceil(np.sqrt(num_spots)))
        xs, ys = np.meshgrid(np.arange(1, side + 1), np.arange(1, side + 1))
        x = xs.ravel()[:num_spots]
        y = ys.ravel()[:num_spots]
        ids = [f"{a}x{b}" for a, b in zip(x, y)]
        counts = rng.poisson(3.0, size=(num_spots, num_genes))
        pd.DataFrame(counts, index=ids, columns=gene_names).to_csv(
            os.path.join(root, "ST-cnts", f"{name}.tsv"), sep="\t"
        )
        pix = 50
        pd.DataFrame(
            {
                "x": x.astype(float),
                "y": y.astype(float),
                "pixel_x": x * pix + 25.0,
                "pixel_y": y * pix + 25.0,
            }
        ).to_csv(os.path.join(root, "ST-spotfiles", f"{name}_selection.tsv"), sep="\t", index=False)
        img_dir = os.path.join(root, "ST-imgs", name[0], name)
        os.makedirs(img_dir, exist_ok=True)
        h = w = (side + 2) * pix
        slide = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        Image.fromarray(slide).save(os.path.join(img_dir, "slide.jpg"))
    return names, gene_names
