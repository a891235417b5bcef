"""L0 A/B: execute the reference hvg scripts' matrix-writing path.

The preprocessing layer was the last reference code verified only against
reimplementations: ``hvg_her2st.py:96-125`` (``her2_pool_gene_list`` — panel
subset, genes x spots transpose — plus the per-GENE
``scp.transform.log(library_size_normalize(...))`` write),
``hvg_cscc.py:94-119`` (same tail over the GSE144240 metainfo CSVs), and
``hvg_visium.py:63-138`` (the vendored ``read_visium_alex`` 10x reader).
These tests execute those reference lines VERBATIM (sliced from the module
source by anchor, never retyped) on synthetic on-disk trees and assert the
written ``preprocessed_matrix.npy`` files match ``cli hvg`` output — pinning
the round-5 fix that phase-B matrices are per-GENE normalized
(``normalize.pergene_logcpm``), unlike the per-SPOT train-time
normalization (``dataset.py:53,188``).

Execution shims (none touch the logic under test):
  * ``scprep`` (absent here) is stubbed from its published formulas —
    ``library_size_normalize`` = row / row-sum x 10,000 (the scprep default
    rescale), ``transform.log`` = log10(x + 1) — independent of
    ``mclstexp_tpu.data.normalize`` (non-circular);
  * ``sc.AnnData`` is a minimal stub holding X as scipy SPARSE. As written
    the reference would crash: ``sc.AnnData(pd.read_csv(...))`` stores a
    dense ndarray, and ``adata[:, gene_list].X.T.toarray()``
    (hvg_her2st.py:108, hvg_cscc.py:106) raises AttributeError on dense X —
    a latent bug like evel_cscc's sklearn NameError (the shipped matrices
    prove the authors ran *some* variant). The sparse stub executes the
    intended path; synthetic gene names are unique so
    ``var_names_make_unique`` is a no-op (its rename semantics are pinned
    by test_visium.py::make_var_names_unique and the dataset A/B);
  * ``matplotlib.image.imread`` / scanpy's ``read_10x_mtx`` for the
    read_visium_alex test are stubbed from their published contracts.

Known divergences re-asserted here rather than hidden:
  * the reference pools ALL cnts-TSV spots; our ``cli hvg`` writes exactly
    the spotfile-joined spot set its eval embeds (cli/main.py cmd_hvg).
    Trees here give every counts row a spotfile row, where both agree;
  * hvg_cscc.py reads ``{name}_metainfo.csv`` (an author-side artifact, not
    in the GEO archive); the synthetic tree writes it with the same counts
    as the stdata TSV, so the A/B compares the TRANSFORM pipeline.
"""

from __future__ import annotations

import os
import types

import numpy as np
import pytest

pd = pytest.importorskip("pandas")
sp = pytest.importorskip("scipy.sparse")

REF = "/root/reference"

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not mounted"
)]

GENES = [f"G{i:03d}" for i in range(20)]          # the shipped panel
EXTRA = ["X1", "X2", "X3"]                        # in counts, not the panel


# ------------------------------------------------------------------- stubs --
def _scp_stub():
    """scprep from its published formulas (independent of our normalize.py)."""
    scp = types.SimpleNamespace()
    scp.normalize = types.SimpleNamespace(
        library_size_normalize=lambda d: np.asarray(d, dtype=np.float64)
        / np.asarray(d, dtype=np.float64).sum(axis=1, keepdims=True) * 10000.0
    )
    scp.transform = types.SimpleNamespace(
        log=lambda d, pseudocount=1, base=10: np.log10(
            np.asarray(d, dtype=np.float64) + pseudocount)
    )
    return scp


class _AnnData:
    """The slice of the AnnData API the executed tails touch. X is sparse —
    see module docstring for why (the dense path is a latent AttributeError
    in the reference)."""

    def __init__(self, df):
        self._df = df
        self.X = sp.csr_matrix(df.values)

    @property
    def var_names(self):
        return list(self._df.columns)

    def var_names_make_unique(self):
        assert len(set(self._df.columns)) == len(self._df.columns), (
            "synthetic genes must be unique (rename semantics pinned elsewhere)"
        )

    def __getitem__(self, key):
        rows, cols = key
        assert rows == slice(None), "tails only column-subset"
        return _AnnData(self._df.loc[:, list(cols)])


def _sc_stub():
    sc = types.SimpleNamespace(AnnData=_AnnData)
    return sc


# ------------------------------------------------------------ tree builders --
def _write_counts_tsv(path, rng, ids, genes_order):
    df = pd.DataFrame(
        rng.integers(1, 40, size=(len(ids), len(genes_order))),
        index=ids, columns=genes_order,
    )
    df.to_csv(path, sep="\t")
    return df


def _write_selection(path, xy):
    x = np.array([a for a, _ in xy], dtype=float)
    y = np.array([b for _, b in xy], dtype=float)
    rng = np.random.default_rng(len(xy))
    pd.DataFrame({
        "x": x + rng.uniform(-0.2, 0.2, len(xy)),
        "y": y + rng.uniform(-0.2, 0.2, len(xy)),
        "pixel_x": rng.uniform(100, 300, len(xy)),
        "pixel_y": rng.uniform(100, 300, len(xy)),
    }).to_csv(path, sep="\t", index=False)


def _spot_ids(rng, n):
    xy = set()
    while len(xy) < n:
        xy.add((int(rng.integers(3, 40)), int(rng.integers(3, 40))))
    xy = sorted(xy)
    return [f"{a}x{b}" for a, b in xy], xy


def _exec_segment(script, segments, ns):
    """Compile + exec anchor-sliced SEGMENTS of a reference script verbatim,
    with path literals patched. segments: list of (start_anchor, end_anchor
    or None for EOF). ns must pre-seed every name the segment reads."""
    with open(script) as f:
        src = f.read()
    for old, new in ns.pop("__patches__", []):
        assert old in src, f"patch target not found in {script}: {old!r}"
        src = src.replace(old, new)
    code = ""
    for start, end in segments:
        i = src.index(start)
        j = src.index(end, i) if end else len(src)
        code += src[i:j] + "\n"
    exec(compile(code, script, "exec"), ns)
    return ns


def _run_cli_hvg(dataset, data_root, panel_npy, out_root):
    from mclstexp_tpu.cli.main import main

    rc = main(["hvg", "--dataset", dataset, "--data-root", str(data_root),
               "--gene-panel", str(panel_npy), "--out", str(out_root)])
    assert rc == 0


# ------------------------------------------------------------------- her2st --
def test_her2st_hvg_matrix_ab(tmp_path, monkeypatch):
    """hvg_her2st.py:77-79 (name derivation) + :96-125 (pool + per-gene
    normalize + write) vs ``cli hvg --dataset her2st``."""
    rng = np.random.default_rng(0)
    root = tmp_path / "her2st"
    (root / "ST-cnts").mkdir(parents=True)
    (root / "ST-spotfiles").mkdir()
    all_names = ["A1", "A2", "B1", "B2"]
    genes_order = list(rng.permutation(GENES + EXTRA))
    panel_npy = tmp_path / "her_genes.npy"
    np.save(panel_npy, np.asarray(GENES, dtype=object), allow_pickle=True)
    for name in all_names:
        ids, xy = _spot_ids(rng, 8)
        _write_counts_tsv(root / "ST-cnts" / f"{name}.tsv", rng, ids, genes_order)
        _write_selection(root / "ST-spotfiles" / f"{name}_selection.tsv", xy)

    workdir = tmp_path / "ref_run"
    workdir.mkdir()
    monkeypatch.chdir(workdir)
    ns = {
        "np": np, "os": os, "pd": pd,
        "sc": _sc_stub(), "scp": _scp_stub(),
        "__patches__": [
            ('"D:\\dataset\\Her2st\\data/ST-cnts"',
             repr(str(root / "ST-cnts"))),
            ('f"D:\\dataset\\Her2st\\data/ST-cnts/{name}.tsv"',
             'f' + repr(str(root / "ST-cnts") + os.sep + "{name}.tsv")),
            ('"D:\\dataset\\Her2st\\data/her_hvg_cut_1000.npy"',
             repr(str(panel_npy))),
        ],
    }
    ns = _exec_segment(
        os.path.join(REF, "hvg_her2st.py"),
        [("def intersect_section_genes", "def her2_hvg_selection_and_pooling"),
         ("names = os.listdir", "# print(names)"),
         ("def her2_pool_gene_list", None)],
        ns,
    )
    # the reference's [1:33] name slice keeps A2, B1, B2 of the 4-file tree
    assert ns["names"] == ["A2", "B1", "B2"]

    out_root = tmp_path / "mine"
    _run_cli_hvg("her2st", root, panel_npy, out_root)

    for name in ns["names"]:
        ref = np.load(
            workdir / "data" / "preprocessed_expression_matrices" / "her2st"
            / name / "preprocessed_matrix.npy")
        mine = np.load(out_root / "her2st" / name / "preprocessed_matrix.npy")
        assert ref.shape == mine.shape == (len(GENES), 8)  # genes x spots
        np.testing.assert_allclose(mine, ref, rtol=1e-5, atol=1e-6)
        # the quirk this pins: rows (GENES) each sum to a 10,000 'library'
        # before the log — i.e. per-gene, not per-spot, normalization
        row_lib = (10.0 ** ref - 1.0).sum(axis=1)
        np.testing.assert_allclose(row_lib, 10000.0, rtol=1e-9)


# --------------------------------------------------------------------- cscc --
def test_cscc_hvg_matrix_ab(tmp_path, monkeypatch):
    """hvg_cscc.py:71-83 (metainfo adata list) + :94-119 (tail) vs
    ``cli hvg --dataset cscc``."""
    rng = np.random.default_rng(1)
    root = tmp_path / "GSE144240_RAW"
    root.mkdir()
    names = [f"{p}_ST_{r}" for p in ("P2", "P5", "P9", "P10")
             for r in ("rep1", "rep2", "rep3")]
    genes_order = list(rng.permutation(GENES + EXTRA))
    panel_npy = tmp_path / "skin_genes.npy"
    np.save(panel_npy, np.asarray(GENES, dtype=object), allow_pickle=True)
    for k, name in enumerate(names):
        ids, xy = _spot_ids(rng, 6 + (k % 3))
        df = _write_counts_tsv(root / f"GSM_{name}_stdata.tsv", rng, ids,
                               genes_order)
        # the author-side metainfo.csv: same counts, CSV (see module doc)
        df.to_csv(root / f"{name}_metainfo.csv")
        _write_selection(root / f"spot_data-selection-{name}.tsv", xy)

    workdir = tmp_path / "ref_run"
    workdir.mkdir()
    monkeypatch.chdir(workdir)
    ns = {
        "np": np, "os": os, "pd": pd,
        "sc": _sc_stub(), "scp": _scp_stub(),
        "__patches__": [
            ('root = "D:\\dataset\\CSCC_data\\GSE144240_RAW/"',
             f'root = {str(root) + os.sep!r}'),
            ('"D:\\dataset\\Her2st\\data/skin_hvg_cut_1000.npy"',
             repr(str(panel_npy))),
        ],
    }
    ns = _exec_segment(
        os.path.join(REF, "hvg_cscc.py"),
        [("def intersect_section_genes", "def her2_hvg_selection_and_pooling"),
         ("patients = ", "filtered_mtx = her2_hvg_selection_and_pooling"),
         ("def her2_pool_gene_list", None)],
        ns,
    )
    assert ns["names"] == names

    out_root = tmp_path / "mine"
    _run_cli_hvg("cscc", root, panel_npy, out_root)

    for name in names:
        ref = np.load(
            workdir / "data" / "preprocessed_expression_matrices"
            / "cscc_data" / name / "preprocessed_matrix.npy")
        mine = np.load(out_root / "cscc" / name / "preprocessed_matrix.npy")
        assert ref.shape == mine.shape and ref.shape[0] == len(GENES)
        np.testing.assert_allclose(mine, ref, rtol=1e-5, atol=1e-6)


# ------------------------------------------------------- visium alex reader --
class _MtxAnnData:
    """What scanpy's read_10x_mtx returns, per its published contract: X
    sparse cells x genes (the mtx stores genes x cells and is transposed),
    obs indexed by barcodes, var_names = the features file's SECOND column
    (gene symbols, the default var_names='gene_symbols')."""

    def __init__(self, X, barcodes, var_names):
        self.X = X
        self.obs = pd.DataFrame(index=pd.Index(barcodes, name=None))
        self.var_names = list(var_names)
        self.uns = {}
        self.obsm = {}

    @property
    def obs_names(self):
        return list(self.obs.index)


def _read_10x_mtx_stub(path):
    import scipy.io as sio

    m = sio.mmread(str(path / "matrix.mtx")).tocsr().T.tocsr()
    bl = (path / "barcodes.tsv").read_text().strip().splitlines()
    feats = [ln.split("\t") for ln in
             (path / "features.tsv").read_text().strip().splitlines()]
    return _MtxAnnData(m, [b.split("\t")[0] for b in bl],
                       [f[1] for f in feats])


def _build_alex_tree(tmp_path, rng, n_spots=7, n_genes=9):
    import scipy.io as sio

    sec = tmp_path / "1142243F"
    mdir = sec / "raw_feature_bc_matrix"
    sdir = sec / "spatial"
    mdir.mkdir(parents=True)
    sdir.mkdir()
    barcodes = [f"BC{i:04d}-1" for i in range(n_spots)]
    genes = [f"VG{i}" for i in range(n_genes)]
    counts = rng.integers(0, 30, size=(n_genes, n_spots))  # genes x cells
    sio.mmwrite(str(mdir / "matrix.mtx"), sp.coo_matrix(counts))
    (mdir / "barcodes.tsv").write_text("\n".join(barcodes) + "\n")
    (mdir / "features.tsv").write_text(
        "\n".join(f"ENSG{i:05d}\t{g}\tGene Expression"
                  for i, g in enumerate(genes)) + "\n")
    # tissue_positions_list.csv: barcode,in_tissue,array_row,array_col,
    # then the two full-res pixel columns (4 and 5)
    order = rng.permutation(n_spots)  # file order != barcode order
    rows = []
    for i in order:
        rows.append(f"{barcodes[i]},1,{i},{2 * i},{1000 + 7 * i},{500 + 3 * i}")
    (sdir / "tissue_positions_list.csv").write_text("\n".join(rows) + "\n")
    (sdir / "scalefactors_json.json").write_text(
        '{"tissue_hires_scalef": 0.1, "spot_diameter_fullres": 100.0}')
    from PIL import Image

    for res in ("hires", "lowres"):
        Image.fromarray(
            rng.integers(0, 255, size=(20, 24, 3), dtype=np.uint8)
        ).save(sdir / f"tissue_{res}_image.png")
    return sec, barcodes, genes, counts


def test_read_visium_alex_ab(tmp_path):
    """hvg_visium.py:63-138's vendored reader vs data/visium.py's
    read_10x_mtx + tissue-position handling on one synthetic Alex tree."""
    from pathlib import Path
    from typing import Optional, Union

    from mclstexp_tpu.data.visium import (
        read_10x_mtx,
        read_barcodes,
        read_tissue_positions,
    )

    rng = np.random.default_rng(2)
    sec, barcodes, genes, counts = _build_alex_tree(tmp_path, rng)

    ns = {
        "Path": Path, "Union": Union, "Optional": Optional,
        "AnnData": object, "pd": pd, "json": __import__("json"),
        "warnings": __import__("warnings"),
        "read_10x_mtx": _read_10x_mtx_stub,
        "imread": lambda p: np.asarray(__import__("PIL.Image", fromlist=["open"])
                                       .open(p), dtype=np.float32) / 255.0,
        "__patches__": [],
    }
    ns = _exec_segment(
        os.path.join(REF, "hvg_visium.py"),
        [("def read_visium_alex", "def intersect_section_genes")],
        ns,
    )
    adata = ns["read_visium_alex"](str(sec))

    mat, my_barcodes, my_genes = read_10x_mtx(str(sec / "raw_feature_bc_matrix"))
    # raw matrix, barcode order, gene symbols agree
    np.testing.assert_array_equal(np.asarray(adata.X.todense()), mat)
    np.testing.assert_array_equal(mat, counts.T)
    assert adata.obs_names == my_barcodes == barcodes
    assert adata.var_names == my_genes == genes

    # the reference names col4 'pxl_col_in_fullres' and col5
    # 'pxl_row_in_fullres' and emits spatial=[col5, col4]; our loader reads
    # the same csv positionally: positions=(col4, col5), centers=(col5, col4)
    # (visium.py:60-63) — so spatial == centers row-for-row
    pos = read_tissue_positions(str(sec / "spatial" / "tissue_positions_list.csv"))
    pos = pos.set_index(0)
    bfile = read_barcodes(str(sec / "raw_feature_bc_matrix" / "barcodes.tsv"))
    v1 = pos.loc[bfile, 4].values
    v2 = pos.loc[bfile, 5].values
    centers = np.stack([v2, v1], axis=1)
    np.testing.assert_array_equal(adata.obsm["spatial"], centers)
