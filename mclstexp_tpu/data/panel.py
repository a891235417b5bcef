"""Gene-panel selection: per-section HVG masks -> union/intersection -> panel.

This is the part of the reference HVG scripts that *produces* the panel
artifacts (reference ``hvg_her2st.py:24-57``): per section, scanpy
``normalize_total -> log1p -> highly_variable_genes(n_top)`` over the genes
shared by every section, then union/intersection bookkeeping. The reference
then subsets everything to a FIXED shipped panel (``her_hvg_cut_1000.npy``,
785 genes) whose derivation ("cut") is not in the repo; for onboarding a
*new* dataset this module provides a documented, deterministic cut:

  * rank shared genes by (#sections selecting them as HVG, mean normalized
    dispersion) descending;
  * keep genes selected by at least ``min_sections`` sections (default 1 ==
    the union), then truncate to ``panel_size`` if given.

Artifacts written by ``save_panel_artifacts`` (cli ``hvg --select-panel``):

  per_section_hvg.npz       bool masks (S, G_shared) + gene/section names
  hvgs_union.pickle         pandas bool Series indexed by gene (the
  hvgs_intersection.pickle  reference's pickle layout, hvg_her2st.py:54-57)
  <dataset>_hvg_panel.npy   object array of panel gene names — directly
                            consumable by ``--gene-panel`` (data/genes.py)
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import List, Optional, Sequence

import numpy as np

from mclstexp_tpu.data.hvg import (
    hvg_mask_from_dispersion,
    hvg_union_intersection,
    seurat_dispersion,
)
from mclstexp_tpu.data.normalize import log1p, normalize_total


@dataclasses.dataclass(frozen=True)
class CountFrame:
    """One section's raw counts with gene names (pre-panel)."""

    name: str
    genes: List[str]
    counts: np.ndarray  # (N_spots, G) raw counts


@dataclasses.dataclass(frozen=True)
class PanelSelection:
    section_names: List[str]
    shared_genes: List[str]  # genes present in every section, stable order
    masks: np.ndarray  # (S, G_shared) bool per-section HVG masks
    union: np.ndarray  # (G_shared,) bool
    intersection: np.ndarray  # (G_shared,) bool
    n_selected: np.ndarray  # (G_shared,) int: #sections selecting each gene
    mean_dispersion: np.ndarray  # (G_shared,) mean normalized dispersion
    panel: List[str]  # the cut panel gene names


def shared_gene_order(frames: Sequence[CountFrame]) -> List[str]:
    """Genes present in every section, in the first section's column order
    (the reference's ``set.intersection`` has no stable order,
    ``hvg_her2st.py:19-21``; first-section order makes the flow
    deterministic — documented divergence)."""
    shared = set(frames[0].genes)
    for f in frames[1:]:
        shared &= set(f.genes)
    return [g for g in frames[0].genes if g in shared]


def select_panel(
    frames: Sequence[CountFrame],
    n_top_genes: int = 1000,
    min_sections: int = 1,
    panel_size: Optional[int] = None,
) -> PanelSelection:
    """The reference per-section HVG flow (``hvg_her2st.py:24-57``) plus the
    documented cut rule above."""
    if not frames:
        raise ValueError("no count frames given")
    shared = shared_gene_order(frames)
    if not shared:
        raise ValueError("sections share no genes")
    idx_per_frame = []
    for f in frames:
        col = {g: i for i, g in enumerate(f.genes)}
        idx_per_frame.append(np.asarray([col[g] for g in shared]))

    masks, disps = [], []
    for f, idx in zip(frames, idx_per_frame):
        counts = np.asarray(f.counts, dtype=np.float64)[:, idx]
        logged = log1p(normalize_total(counts))
        # one full-matrix dispersion pass per section feeds both the
        # selection mask and the ranking signal
        _, disp_norm = seurat_dispersion(logged)
        masks.append(hvg_mask_from_dispersion(disp_norm, n_top_genes))
        disps.append(disp_norm)
    masks = np.asarray(masks)
    union, intersection = hvg_union_intersection(masks)
    n_selected = masks.sum(axis=0).astype(np.int64)
    disp_arr = np.asarray(disps)
    finite = np.isfinite(disp_arr)
    mean_disp = np.where(
        finite.any(axis=0),
        np.where(finite, disp_arr, 0.0).sum(axis=0) / np.maximum(finite.sum(axis=0), 1),
        -np.inf,
    )

    keep = n_selected >= max(1, min_sections)
    order = np.lexsort((-mean_disp, -n_selected))  # freq desc, then disp desc
    ranked = [i for i in order if keep[i]]
    if panel_size is not None:
        ranked = ranked[:panel_size]
    panel = [shared[i] for i in ranked]

    return PanelSelection(
        section_names=[f.name for f in frames],
        shared_genes=shared,
        masks=masks,
        union=union,
        intersection=intersection,
        n_selected=n_selected,
        mean_dispersion=mean_disp,
        panel=panel,
    )


def save_panel_artifacts(sel: PanelSelection, out_dir: str, dataset: str) -> str:
    """Write the artifact set; returns the panel .npy path."""
    os.makedirs(out_dir, exist_ok=True)
    np.savez(
        os.path.join(out_dir, "per_section_hvg.npz"),
        masks=sel.masks,
        genes=np.asarray(sel.shared_genes, dtype=object),
        sections=np.asarray(sel.section_names, dtype=object),
        n_selected=sel.n_selected,
        mean_dispersion=sel.mean_dispersion,
    )
    try:
        import pandas as pd

        union_s = pd.Series(sel.union, index=sel.shared_genes)
        inter_s = pd.Series(sel.intersection, index=sel.shared_genes)
    except ImportError:  # pragma: no cover - pandas is a hard dep elsewhere
        union_s, inter_s = sel.union, sel.intersection
    with open(os.path.join(out_dir, "hvgs_union.pickle"), "wb") as f:
        pickle.dump(union_s, f, protocol=pickle.HIGHEST_PROTOCOL)
    with open(os.path.join(out_dir, "hvgs_intersection.pickle"), "wb") as f:
        pickle.dump(inter_s, f, protocol=pickle.HIGHEST_PROTOCOL)
    panel_path = os.path.join(out_dir, f"{dataset}_hvg_panel.npy")
    np.save(panel_path, np.asarray(sel.panel, dtype=object), allow_pickle=True)
    return panel_path


# ------------------------------------------------- raw count-frame loaders


def her2st_count_frames(root: str) -> List[CountFrame]:
    """Full (pre-panel) count tables, reference protocol section order
    (``hvg_her2st.py:77-84``: sorted(ST-cnts)[1:33])."""
    from mclstexp_tpu.data.st_dataset import (
        _read_tsv, her2st_cnt_path, her2st_section_names,
    )

    out = []
    for name in her2st_section_names(root):
        cnt = _read_tsv(her2st_cnt_path(root, name), index_col=0)
        out.append(
            CountFrame(name, [str(g) for g in cnt.columns], cnt.values.astype(np.float32))
        )
    return out


def cscc_count_frames(root: str) -> List[CountFrame]:
    """cSCC count tables (``hvg_cscc.py``'s metainfo flow maps onto the same
    stdata TSVs the dataset reader uses)."""
    from mclstexp_tpu.data.st_dataset import (
        _read_tsv, cscc_cnt_path, cscc_section_names,
    )

    out = []
    for name in cscc_section_names():
        cnt = _read_tsv(cscc_cnt_path(root, name), index_col=0)
        out.append(
            CountFrame(name, [str(g) for g in cnt.columns], cnt.values.astype(np.float32))
        )
    return out


def visium_count_frames(matrix_dirs: dict) -> List[CountFrame]:
    """10x mtx count frames ({section: matrix_dir}; reference
    ``hvg_visium.py:63-138`` reader semantics via data.visium)."""
    from mclstexp_tpu.data.visium import make_var_names_unique, read_10x_mtx

    out = []
    for name, d in matrix_dirs.items():
        mat, _barcodes, gene_names = read_10x_mtx(d)  # (spots, genes)
        genes = make_var_names_unique(gene_names)
        out.append(CountFrame(name, [str(g) for g in genes], mat.astype(np.float32)))
    return out


def count_frames_for_dataset(dataset: str, data_root: str) -> List[CountFrame]:
    if dataset == "her2st":
        return her2st_count_frames(data_root)
    if dataset == "cscc":
        return cscc_count_frames(data_root)
    raise ValueError(
        f"panel selection for dataset {dataset!r} needs explicit count "
        "frames (visium: pass matrix dirs via visium_count_frames)"
    )
