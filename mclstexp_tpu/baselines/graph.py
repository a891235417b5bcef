"""Spot-graph construction for the GNN baselines.

Equivalent of the ``calcADJ`` k-NN adjacency shared by Hist2ST/THItoGene
(reference ``baselines/His2ST/graph_construction.py:4-30``): for each spot,
connect its k nearest neighbors (by a chosen metric on array coordinates),
optionally pruned — 'Grid' keeps only neighbors at distance <= 2.0 (the
exact hex/grid neighbors), 'STD' keeps those within mean+std of the k
distances. Vectorized NumPy instead of the reference's per-spot Python loop;
the result is the same dense 0/1 matrix the dense-matmul GNN layers consume.
"""

from __future__ import annotations

import numpy as np


def knn_adjacency(
    coords: np.ndarray,
    k: int = 4,
    metric: str = "euclidean",
    prune: str = "grid",
) -> np.ndarray:
    """Dense (N, N) float32 adjacency; coords (N, 2) array coordinates."""
    coords = np.asarray(coords, dtype=np.float64)
    n = len(coords)
    if k == 0:
        k = n - 1
    k = min(k, n - 1)

    diff = coords[:, None, :] - coords[None, :, :]
    if metric == "euclidean":
        dist = np.sqrt((diff**2).sum(-1))
    elif metric == "cityblock":
        dist = np.abs(diff).sum(-1)
    else:
        raise ValueError(f"unknown metric {metric!r}")

    order = np.argsort(dist, axis=1)  # column 0 is self
    neigh = order[:, 1 : k + 1]  # (N, k)
    ndist = np.take_along_axis(dist, neigh, axis=1)

    if prune in ("na", "none", None):
        keep = np.ones_like(ndist, dtype=bool)
    elif prune == "grid":
        keep = ndist <= 2.0
    elif prune == "std":
        bound = ndist.mean(axis=1, keepdims=True) + ndist.std(axis=1, keepdims=True)
        keep = ndist <= bound
    else:
        raise ValueError(f"unknown prune {prune!r}")

    adj = np.zeros((n, n), dtype=np.float32)
    rows = np.repeat(np.arange(n), k)
    adj[rows[keep.ravel()], neigh.ravel()[keep.ravel()]] = 1.0
    return adj


def normalized_neighbor_mean(adj: np.ndarray) -> np.ndarray:
    """Row-normalized adjacency for mean aggregation (degree-safe)."""
    deg = adj.sum(axis=1, keepdims=True)
    return adj / np.where(deg == 0, 1.0, deg)
