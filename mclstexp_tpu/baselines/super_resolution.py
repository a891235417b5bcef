"""Super-resolution prediction: synthesize a dense grid of patch centers and
predict expression at unseen positions (HisToGene's SR mode, reference
``baselines/HisToGene/dataset.py:304-338`` + ``predict.py:46-68``).

Grid semantics match the reference: 56-px steps across the bounding box of
the real spot centers, with array positions quantized to a 30x30 grid of the
box (``(x - min_x) // ((max_x - min_x) // 30)`` — the reference uses
``x // r_x``, which assumes min_x ~ 0; we keep the reference's exact
formula for parity). Patches are cut from the slide at each grid center.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from mclstexp_tpu.data.section import Section
from mclstexp_tpu.ops.patches import extract_patches_np


def sr_grid(centers: np.ndarray, step: int = 56, n_bins: int = 30) -> Tuple[np.ndarray, np.ndarray]:
    """(grid_centers (M, 2), grid_positions (M, 2)) over the spot bbox."""
    centers = np.asarray(centers)
    min_x, max_x = int(centers[:, 0].min()), int(centers[:, 0].max())
    min_y, max_y = int(centers[:, 1].min()), int(centers[:, 1].max())
    r_x = max((max_x - min_x) // n_bins, 1)
    r_y = max((max_y - min_y) // n_bins, 1)
    xs = np.arange(min_x, max_x, step)
    ys = np.arange(min_y, max_y, step)
    gx, gy = np.meshgrid(xs, ys)
    grid_centers = np.stack([gx.ravel(), gy.ravel()], axis=1).astype(np.int32)
    grid_positions = np.stack(
        [grid_centers[:, 0] // r_x, grid_centers[:, 1] // r_y], axis=1
    ).astype(np.int32)
    return grid_centers, grid_positions


def sr_section(section: Section, slide: np.ndarray, patch_size: int = 112) -> Section:
    """A synthetic Section over the SR grid (no expression ground truth)."""
    grid_centers, grid_positions = sr_grid(section.centers)
    patches = extract_patches_np(slide, grid_centers, patch_size)
    m = len(grid_centers)
    return Section(
        name=f"{section.name}_sr",
        expression=np.zeros((m, section.num_genes), np.float32),
        positions=np.clip(grid_positions, 0, 63),
        centers=grid_centers,
        patches=patches,
    )


def sr_predict(model, state, section: Section, slide: np.ndarray, cfg) -> Tuple[np.ndarray, np.ndarray]:
    """(predictions (M, G), grid centers (M, 2)) on the dense grid."""
    from mclstexp_tpu.baselines.trainer import predict_slide

    sr_sec = sr_section(section, slide, cfg.patch_size)
    preds = predict_slide(model, state, sr_sec, cfg)
    return preds, sr_sec.centers
