"""10x Visium dataset reader (Swarbrick Alex_NatGen + 10xGenomics sections).

Reproduces the reference's TenxDataset semantics (reference
``dataset.py:307-341`` and ``train.py:58-84``):
  * per-barcode pixel coords from ``tissue_positions_list.csv`` columns 4/5
    (pixel row v1, pixel col v2), filtered to the barcodes in
    ``barcodes.tsv(.gz)``;
  * expression from a precomputed ``preprocessed_matrix.npy`` (genes x spots,
    transposed to spots x genes), produced by the HVG pipeline over the
    common 685-gene panel;
  * 224x224 patch cut at [v1-112:v1+112, v2-112:v2+112] — i.e. patch center
    (x, y) = (v2, v1);
  * 'position' fed to the coordinate tables = (v1, v2) raw pixel coords
    (hence the 65536-entry tables).

Also includes the spaceranger ingestion needed to *build* the preprocessed
matrices (reference ``hvg_visium.py:63-138``: 10x mtx + barcodes/features).
"""

from __future__ import annotations

import gzip
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from mclstexp_tpu.data.section import Section
from mclstexp_tpu.ops.patches import extract_patches_np

VISIUM_SECTIONS_ALEX = ("1142243F", "CID4290", "CID4465", "CID44971", "CID4535", "1160920F")
VISIUM_SECTIONS_10X = ("block1", "block2", "FFPE")
VISIUM_SECTIONS = VISIUM_SECTIONS_ALEX + VISIUM_SECTIONS_10X


def read_barcodes(path: str) -> List[str]:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        return [line.strip().split("\t")[0] for line in f if line.strip()]


def read_tissue_positions(path: str):
    import pandas as pd

    return pd.read_csv(path, sep=",", header=None)


def load_visium_section(
    name: str,
    image_path: str,
    spatial_pos_path: str,
    barcode_path: str,
    reduced_mtx_path: str,
    patch_size: int = 224,
    cache_dir: Optional[str] = None,
    with_patches: bool = True,
) -> Section:
    barcodes = read_barcodes(barcode_path)
    pos = read_tissue_positions(spatial_pos_path).set_index(0)
    v1 = pos.loc[barcodes, 4].values.astype(np.int64)
    v2 = pos.loc[barcodes, 5].values.astype(np.int64)
    positions = np.stack([v1, v2], axis=1).astype(np.int32)  # (v1, v2), dataset.py:339
    centers = np.stack([v2, v1], axis=1).astype(np.int32)  # patch center (x, y)

    expression = np.load(reduced_mtx_path).T.astype(np.float32)  # spots x genes
    if len(expression) != len(barcodes):
        raise ValueError(
            f"{name}: {len(barcodes)} barcodes but {len(expression)} expression rows"
        )

    patches = None
    if with_patches:
        cache_path = os.path.join(cache_dir, f"{name}.npy") if cache_dir else None
        if cache_path and os.path.exists(cache_path):
            patches = np.load(cache_path, mmap_mode="r")
            # wrong-patch-size cache is a miss (see st_dataset counterpart)
            if patches.shape[1:3] != (patch_size, patch_size):
                patches = None
        if patches is None:
            import cv2

            os.environ.setdefault("OPENCV_IO_MAX_IMAGE_PIXELS", str(2**40))
            slide = cv2.imread(image_path)
            if slide is None:
                raise FileNotFoundError(image_path)
            patches = extract_patches_np(slide, centers, patch_size)
            if cache_path:
                os.makedirs(cache_dir, exist_ok=True)
                np.save(cache_path, patches)

    return Section(
        name=name,
        expression=expression,
        positions=positions,
        centers=centers,
        patches=patches,
    )


def visium_section_paths(data_root: str, preprocessed_root: str, name: str) -> dict:
    """Standard layout: <data_root>/<name>/{image.tif, spatial/..., *count_matrix/...}
    matching the reference's path scheme (train.py:63-76) minus drive letters."""
    base = os.path.join(data_root, name)
    bc_dir = (
        "filtered_count_matrix" if name in VISIUM_SECTIONS_ALEX else "filtered_feature_bc_matrix"
    )
    return dict(
        name=name,
        image_path=os.path.join(base, "image.tif"),
        spatial_pos_path=os.path.join(base, "spatial", "tissue_positions_list.csv"),
        barcode_path=os.path.join(base, bc_dir, "barcodes.tsv.gz"),
        reduced_mtx_path=os.path.join(preprocessed_root, name, "preprocessed_matrix.npy"),
    )


def load_visium(
    data_root: str,
    preprocessed_root: str,
    names: Sequence[str] = VISIUM_SECTIONS,
    patch_size: int = 224,
    cache_dir: Optional[str] = None,
    with_patches: bool = True,
) -> List[Section]:
    out = []
    for name in names:
        paths = visium_section_paths(data_root, preprocessed_root, name)
        out.append(
            load_visium_section(
                patch_size=patch_size, cache_dir=cache_dir, with_patches=with_patches, **paths
            )
        )
    return out


def make_var_names_unique(names: Sequence[str]) -> List[str]:
    """scanpy ``var_names_make_unique`` semantics: duplicates get -1, -2, ..."""
    seen: dict = {}
    out = []
    for n in names:
        if n in seen:
            seen[n] += 1
            out.append(f"{n}-{seen[n]}")
        else:
            seen[n] = 0
            out.append(n)
    return out


def build_visium_preprocessed(
    matrix_dirs: dict,
    out_root: str,
    gene_list: Sequence[str],
) -> None:
    """Build per-section ``preprocessed_matrix.npy`` files for Visium
    (reference ``hvg_visium.py:199-243``).

    matrix_dirs: {section name: path to the 10x mtx triplet directory}.

    Reference quirk reproduced deliberately: the matrices are stored
    gene x spot and ``library_size_normalize`` + log10 are applied in THAT
    orientation (``hvg_visium.py:215,234-236``) — i.e. each *gene* row is
    L1-normalized across spots, unlike the per-spot normalization of the
    HER2ST/cSCC paths. The eval ground truth uses the same matrices, so the
    protocol is self-consistent; we match it for parity.
    """
    from mclstexp_tpu.data.normalize import library_size_normalize, log_transform

    for name, mdir in matrix_dirs.items():
        mat, barcodes, gene_names = read_10x_mtx(mdir)  # (spots, genes)
        gene_names = make_var_names_unique(gene_names)
        col = {g: i for i, g in enumerate(gene_names)}
        idx = [col[g] for g in gene_list]
        sub = mat[:, idx].T.astype(np.float64)  # gene x spot
        pre = log_transform(library_size_normalize(sub))
        d = os.path.join(out_root, name)
        os.makedirs(d, exist_ok=True)
        np.save(os.path.join(d, "preprocessed_matrix.npy"), pre)


def read_10x_mtx(matrix_dir: str) -> Tuple[np.ndarray, List[str], List[str]]:
    """Read a 10x mtx triplet (matrix.mtx(.gz), barcodes, features) into a dense
    (spots x genes) array (reference ``hvg_visium.py:63-138`` vendored reader).
    """
    import scipy.io as sio

    def find(prefixes):
        for p in prefixes:
            full = os.path.join(matrix_dir, p)
            if os.path.exists(full):
                return full
        raise FileNotFoundError(f"none of {prefixes} under {matrix_dir}")

    mtx_path = find(["matrix.mtx.gz", "matrix.mtx"])
    bc_path = find(["barcodes.tsv.gz", "barcodes.tsv"])
    feat_path = find(["features.tsv.gz", "features.tsv", "genes.tsv.gz", "genes.tsv"])

    if mtx_path.endswith(".gz"):
        with gzip.open(mtx_path, "rb") as f:
            mat = sio.mmread(f)
    else:
        mat = sio.mmread(mtx_path)
    mat = np.asarray(mat.todense()).T  # 10x stores genes x cells; -> cells x genes
    barcodes = read_barcodes(bc_path)

    opener = gzip.open if feat_path.endswith(".gz") else open
    with opener(feat_path, "rt") as f:
        rows = [line.strip().split("\t") for line in f if line.strip()]
    gene_names = [r[1] if len(r) > 1 else r[0] for r in rows]
    return mat, barcodes, gene_names
