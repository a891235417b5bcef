"""Visium reader + preprocessing pipeline tests on synthetic 10x layouts."""

import gzip
import os

import numpy as np
import pytest

from mclstexp_tpu.data import visium
from mclstexp_tpu.data.normalize import library_size_normalize, log_transform


def _write_10x(tmp_path, n_spots=6, genes=("G1", "G2", "G2", "G3")):
    """Minimal 10x mtx triplet + spatial layout for one section."""
    import scipy.io as sio
    import scipy.sparse as sp

    rng = np.random.default_rng(0)
    mdir = tmp_path / "filtered_count_matrix"
    mdir.mkdir(parents=True)
    counts = rng.poisson(3.0, size=(len(genes), n_spots))  # genes x cells
    sio.mmwrite(str(mdir / "matrix.mtx"), sp.coo_matrix(counts))
    barcodes = [f"BC{i}" for i in range(n_spots)]
    with open(mdir / "barcodes.tsv", "w") as f:
        f.write("\n".join(barcodes) + "\n")
    with open(mdir / "features.tsv", "w") as f:
        f.write("\n".join(f"ENSG{i}\t{g}" for i, g in enumerate(genes)) + "\n")

    # spatial positions: barcode,in_tissue,row,col,pixel_row,pixel_col
    sdir = tmp_path / "spatial"
    sdir.mkdir()
    with open(sdir / "tissue_positions_list.csv", "w") as f:
        for i, bc in enumerate(barcodes):
            f.write(f"{bc},1,{i},{i},{200 + 10 * i},{300 + 10 * i}\n")
    return str(mdir), barcodes, counts


def test_read_10x_mtx(tmp_path):
    mdir, barcodes, counts = _write_10x(tmp_path)
    mat, bc, genes = visium.read_10x_mtx(mdir)
    assert mat.shape == (6, 4)  # cells x genes
    np.testing.assert_array_equal(mat, counts.T)
    assert bc == barcodes
    assert genes == ["G1", "G2", "G2", "G3"]


def test_make_var_names_unique():
    assert visium.make_var_names_unique(["A", "B", "A", "A"]) == ["A", "B", "A-1", "A-2"]


def test_build_visium_preprocessed_gene_orientation(tmp_path):
    """The quirk: normalization happens on the gene x spot orientation."""
    mdir, _, counts = _write_10x(tmp_path)
    out = tmp_path / "prep"
    visium.build_visium_preprocessed({"sec1": mdir}, str(out), ["G1", "G3"])
    got = np.load(out / "sec1" / "preprocessed_matrix.npy")
    assert got.shape == (2, 6)  # gene x spot

    sub = counts[[0, 3], :].astype(np.float64)  # G1, G3 rows, gene x spot
    expected = log_transform(library_size_normalize(sub))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_load_visium_section(tmp_path):
    mdir, barcodes, counts = _write_10x(tmp_path)
    # build preprocessed over two panel genes
    out = tmp_path / "prep"
    visium.build_visium_preprocessed({"sec1": mdir}, str(out), ["G1", "G3"])

    import cv2

    slide = np.random.default_rng(1).integers(0, 255, size=(600, 600, 3), dtype=np.uint8)
    img_path = str(tmp_path / "image.tif")
    cv2.imwrite(img_path, slide)

    section = visium.load_visium_section(
        name="sec1",
        image_path=img_path,
        spatial_pos_path=str(tmp_path / "spatial" / "tissue_positions_list.csv"),
        barcode_path=str(tmp_path / "filtered_count_matrix" / "barcodes.tsv"),
        reduced_mtx_path=str(out / "sec1" / "preprocessed_matrix.npy"),
        patch_size=32,
    )
    assert section.num_spots == 6 and section.num_genes == 2
    # position = (v1, v2) = (pixel_row, pixel_col); center = (x, y) = (v2, v1)
    np.testing.assert_array_equal(section.positions[0], [200, 300])
    np.testing.assert_array_equal(section.centers[0], [300, 200])
    assert section.patches.shape == (6, 32, 32, 3)
    # patch center pixel equals the slide pixel at (row v1, col v2); cv2
    # round-trips BGR so raw values match the written array exactly
    np.testing.assert_array_equal(section.patches[0, 16, 16], slide[200, 300])
