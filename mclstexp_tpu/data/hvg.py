"""Highly-variable-gene selection (seurat flavor), NumPy only.

Replicates scanpy ``sc.pp.highly_variable_genes(adata, n_top_genes=N)``
(flavor='seurat', the default) as used per section by the reference HVG
pipeline (reference ``hvg_her2st.py:35-37``): on log1p-normalized data,

  1. un-log (expm1), compute per-gene mean and dispersion = var / mean
     (ddof=1 variance); then mean <- log1p(mean), dispersion <- log(dispersion);
  2. cut genes into 20 *equal-width* bins of (log1p) mean; z-score the log
     dispersion within each bin (scanpy quirk: a bin with a single gene has
     std = NaN, which scanpy replaces by the bin's mean dispersion with the
     bin mean set to 0 — i.e. z = disp / disp = 1);
  3. keep the top-N genes by normalized dispersion (ties at the cutoff are
     broken deterministically here; scanpy may keep extras).

For the three benchmark datasets the panels are shipped as data artifacts
(``data/her_hvg_cut_1000.npy`` etc.) and should be used directly (SURVEY
§7 risk list); this module exists for applying the framework to new data.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def seurat_dispersion(log_data: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-gene (mean, normalized dispersion) on log1p data, seurat flavor."""
    x = np.expm1(np.asarray(log_data, dtype=np.float64))
    mean = x.mean(axis=0)
    var = x.var(axis=0, ddof=1)
    mean_safe = np.where(mean == 0, 1e-12, mean)
    dispersion = var / mean_safe
    # scanpy: log1p the mean, log the dispersion before binning
    disp_log = np.log(np.where(dispersion == 0, np.nan, dispersion))
    mean_log = np.log1p(mean)

    n_bins = 20
    # pd.cut semantics: equal-width bins over [min, max] of the log1p means.
    lo, hi = mean_log.min(), mean_log.max()
    width = (hi - lo) or 1.0
    bin_idx = np.clip(((mean_log - lo) / width * n_bins).astype(int), 0, n_bins - 1)

    disp_norm = np.zeros_like(disp_log)
    for b in range(n_bins):
        mask = bin_idx == b
        if not mask.any():
            continue
        vals = disp_log[mask]
        mu = np.nanmean(vals)
        sd = np.nanstd(vals, ddof=1) if mask.sum() > 1 else np.nan
        if not np.isfinite(sd) or sd == 0:
            # single-gene (or degenerate) bin: scanpy sets std := bin mean,
            # mean := 0, so z = disp / bin_mean.
            denom = mu if (np.isfinite(mu) and mu != 0) else 1.0
            disp_norm[mask] = vals / denom
        else:
            disp_norm[mask] = (vals - mu) / sd
    disp_norm = np.nan_to_num(disp_norm, nan=-np.inf)
    return mean, disp_norm


def highly_variable_genes(log_data: np.ndarray, n_top_genes: int = 1000) -> np.ndarray:
    """Boolean mask of the top-N genes by normalized dispersion."""
    _, disp_norm = seurat_dispersion(log_data)
    return hvg_mask_from_dispersion(disp_norm, n_top_genes)


def hvg_mask_from_dispersion(disp_norm: np.ndarray, n_top_genes: int) -> np.ndarray:
    """Top-N mask from a precomputed normalized dispersion (lets callers
    that also need disp_norm itself run the expensive full-matrix
    seurat_dispersion pass once, e.g. data/panel.select_panel)."""
    n_top_genes = min(n_top_genes, disp_norm.shape[0])
    cutoff = np.sort(disp_norm)[::-1][n_top_genes - 1]
    mask = disp_norm >= cutoff
    # break ties deterministically if > n_top_genes pass the cutoff
    if mask.sum() > n_top_genes:
        order = np.argsort(-disp_norm, kind="stable")
        mask = np.zeros_like(mask)
        mask[order[:n_top_genes]] = True
    return mask


def hvg_union_intersection(
    masks: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Union and intersection of per-section HVG masks (the bookkeeping of
    reference ``hvg_her2st.py:43-57``)."""
    masks = np.asarray(masks, dtype=bool)
    return masks.any(axis=0), masks.all(axis=0)
