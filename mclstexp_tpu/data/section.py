"""The uniform section record every dataset reader produces.

The reference keeps per-section state in parallel dicts inside each torch
Dataset (``dataset.py:48-61,183-199``: img_dict / exp_dict / center_dict /
loc_dict / label). Here a section is one immutable record; readers produce
``list[Section]`` and the training/eval pipelines are dataset-agnostic.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class Section:
    name: str
    expression: np.ndarray  # (N, G) float32 log-CPM over the HVG panel
    positions: np.ndarray  # (N, 2) int32 — what the (x, y) tables index
    centers: np.ndarray  # (N, 2) int32 pixel (x, y) patch centers
    patches: Optional[np.ndarray] = None  # (N, P, P, 3) uint8, pre-cut
    labels: Optional[np.ndarray] = None  # pathologist annotations (strings)
    counts: Optional[np.ndarray] = None  # (N, G) raw counts over the panel
    # (needed by the NB/ZINB heads of the Hist2ST baseline; size factors are
    # counts.sum(1)/median, computed lazily)

    @property
    def eval_expression(self) -> np.ndarray:
        """Expression in the eval protocol's normalization.

        The reference's phase-B retrieval keys and ground truth come from
        the hvg scripts' per-GENE normalized matrices, not the per-SPOT
        train-time normalization (see ``normalize.pergene_logcpm``). Where
        raw counts are available, recompute that quirk; readers that load
        already-per-gene matrices directly (visium, dataset.py:313) carry
        no counts and fall back to ``expression`` unchanged.
        """
        if self.counts is None:
            return self.expression
        if getattr(self, "_eval_expression", None) is None:
            from mclstexp_tpu.data.normalize import pergene_logcpm

            self._eval_expression = pergene_logcpm(self.counts)
        return self._eval_expression

    @property
    def size_factors(self) -> Optional[np.ndarray]:
        if self.counts is None:
            return None
        lib = self.counts.sum(axis=1)
        med = np.median(lib[lib > 0]) if (lib > 0).any() else 1.0
        return (lib / med).astype(np.float32)

    def __post_init__(self):
        n = len(self.expression)
        assert len(self.positions) == n and len(self.centers) == n, (
            f"section {self.name}: inconsistent lengths"
        )

    @property
    def num_spots(self) -> int:
        return len(self.expression)

    @property
    def num_genes(self) -> int:
        return self.expression.shape[1]
