"""Post-hoc analysis: per-gene ranking, spatial plots, domain clustering.

The functional equivalent of the reference's ``tutorial.ipynb`` (SURVEY §2
C17): rank genes by mean -log10(p) of their prediction-vs-truth correlation
across sections, visualize the best sections spatially, and cluster
predicted expression against pathologist annotations (ARI/NMI).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from mclstexp_tpu.infer.metrics import cluster_predictions, pearson_per_gene


def gene_ranking(
    preds: Sequence[np.ndarray],  # per section (N_i, G)
    truths: Sequence[np.ndarray],
    gene_names: Sequence[str],
    section_names: Optional[Sequence[str]] = None,
):
    """Per-gene prediction quality across sections (tutorial cell 2).

    Returns a DataFrame with per-gene mean PCC, mean -log10(p), the best
    section and its PCC, sorted by mean -log10(p) descending.
    """
    import pandas as pd

    section_names = section_names or [f"S{i}" for i in range(len(preds))]
    rs, logps = [], []
    for pred, true in zip(preds, truths):
        r, p = pearson_per_gene(pred, true)
        rs.append(r)
        with np.errstate(divide="ignore"):
            logps.append(-np.log10(np.clip(p, 1e-300, None)))
    rs = np.stack(rs)  # (S, G)
    logps = np.stack(logps)

    with np.errstate(invalid="ignore"):
        mean_r = np.nanmean(rs, axis=0)
        mean_logp = np.nanmean(logps, axis=0)
    best_idx = np.nanargmax(np.where(np.isnan(rs), -np.inf, rs), axis=0)
    df = pd.DataFrame(
        {
            "gene": list(gene_names),
            "mean_pcc": mean_r,
            "mean_neglog10_p": mean_logp,
            "best_section": [section_names[i] for i in best_idx],
            "best_pcc": rs[best_idx, np.arange(rs.shape[1])],
        }
    )
    return df.sort_values("mean_neglog10_p", ascending=False).reset_index(drop=True)


def spatial_plot(
    centers: np.ndarray,  # (N, 2) pixel (x, y)
    values: np.ndarray,  # (N,) per-spot values (e.g. one gene's expression)
    title: str = "",
    ax=None,
    cmap: str = "viridis",
    spot_size: float = 12.0,
):
    """Scatter a per-spot quantity at its spatial coordinates (tutorial
    spatial expression plots). Returns the matplotlib axis."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots(figsize=(4, 4))
    sc = ax.scatter(centers[:, 0], centers[:, 1], c=values, s=spot_size, cmap=cmap)
    ax.invert_yaxis()
    ax.set_aspect("equal")
    ax.set_title(title)
    ax.axis("off")
    plt.colorbar(sc, ax=ax, shrink=0.7)
    return ax


def compare_gene_plot(
    centers: np.ndarray,
    pred: np.ndarray,  # (N, G)
    true: np.ndarray,
    gene_names: Sequence[str],
    gene: str,
    out_path: Optional[str] = None,
):
    """Side-by-side predicted vs measured spatial maps for one gene."""
    import matplotlib.pyplot as plt

    g = list(gene_names).index(gene)
    r, _ = pearson_per_gene(pred[:, g : g + 1], true[:, g : g + 1])
    fig, axes = plt.subplots(1, 2, figsize=(9, 4))
    spatial_plot(centers, pred[:, g], f"{gene} predicted (r={r[0]:.3f})", axes[0])
    spatial_plot(centers, true[:, g], f"{gene} measured", axes[1])
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=120)
    return fig


def domain_clustering(
    pred: np.ndarray, labels: Sequence[str]
) -> Dict[str, float]:
    """Predicted-expression domain clustering vs pathologist labels
    (tutorial cell 3; reference ``utils.py:67-79``)."""
    return cluster_predictions(pred, labels)
