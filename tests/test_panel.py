"""Gene-panel selection artifacts (cli hvg --select-panel).

The reference HVG scripts both *select* per-section HVGs and emit the panel
bookkeeping (reference ``hvg_her2st.py:24-57``); round 2 only wrote the
preprocessed matrices. These tests pin the full onboarding loop for a NEW
dataset: raw counts -> select_panel -> saved artifacts -> genes.load_panel
-> dataset loader subsets to the fresh panel.
"""

import os
import pickle

import numpy as np
import pytest

from mclstexp_tpu.data import genes
from mclstexp_tpu.data.panel import (
    CountFrame,
    save_panel_artifacts,
    select_panel,
    shared_gene_order,
)


def _frames(rng, n_sections=3, n_spots=40, n_genes=30, hot=(0, 1, 2, 3)):
    """Sections where genes in `hot` have high variance everywhere; gene 5
    is hot only in section 0; gene names overlap partially (shared = g0..)."""
    frames = []
    for s in range(n_sections):
        gene_names = [f"g{i}" for i in range(n_genes)]
        if s == 1:
            gene_names += ["extra_only_in_1"]  # must be excluded from shared
        counts = rng.poisson(5.0, size=(n_spots, len(gene_names))).astype(np.float32)
        for g in hot:
            counts[:, g] = rng.poisson(1.0, n_spots) * rng.integers(0, 60, n_spots)
        if s == 0:
            counts[:, 5] = rng.poisson(1.0, n_spots) * rng.integers(0, 60, n_spots)
        frames.append(CountFrame(f"sec{s}", gene_names, counts))
    return frames


def test_shared_gene_order(rng):
    frames = _frames(rng)
    shared = shared_gene_order(frames)
    assert "extra_only_in_1" not in shared
    assert shared == [f"g{i}" for i in range(30)]  # first-section order


def test_select_panel_masks_and_cut(rng):
    frames = _frames(rng)
    sel = select_panel(frames, n_top_genes=8)
    assert sel.masks.shape == (3, 30)
    assert sel.masks.sum(axis=1).tolist() == [8, 8, 8]
    np.testing.assert_array_equal(sel.union, sel.masks.any(axis=0))
    np.testing.assert_array_equal(sel.intersection, sel.masks.all(axis=0))
    assert sel.n_selected.max() <= 3 and sel.n_selected[sel.union].min() >= 1

    # default cut == the union, ranked by (selection frequency, dispersion)
    assert set(sel.panel) == {sel.shared_genes[i] for i in np.where(sel.union)[0]}
    ranks = [sel.shared_genes.index(g) for g in sel.panel]
    freq = sel.n_selected[ranks]
    assert (np.diff(freq) <= 0).all()  # frequency non-increasing
    for a, b in zip(ranks, ranks[1:]):
        if sel.n_selected[a] == sel.n_selected[b]:
            assert sel.mean_dispersion[a] >= sel.mean_dispersion[b]

    # min_sections cut drops every gene below the threshold
    sel2 = select_panel(frames, n_top_genes=8, min_sections=2)
    assert all(
        sel2.n_selected[sel2.shared_genes.index(g)] >= 2 for g in sel2.panel
    )
    assert len(sel2.panel) < len(sel.panel)  # some genes were section-specific

    # panel_size truncation is a prefix of the same ranking
    sel3 = select_panel(frames, n_top_genes=8, panel_size=4)
    assert sel3.panel == sel.panel[:4]


def test_artifact_roundtrip(rng, tmp_path):
    frames = _frames(rng)
    sel = select_panel(frames, n_top_genes=8)
    path = save_panel_artifacts(sel, str(tmp_path), "newds")

    # the reference-style pickles are pandas bool Series indexed by gene
    with open(tmp_path / "hvgs_union.pickle", "rb") as f:
        union = pickle.load(f)
    assert list(union.index) == sel.shared_genes
    np.testing.assert_array_equal(union.values, sel.union)

    npz = np.load(tmp_path / "per_section_hvg.npz", allow_pickle=True)
    np.testing.assert_array_equal(npz["masks"], sel.masks)
    assert list(npz["sections"]) == ["sec0", "sec1", "sec2"]

    # the panel .npy is directly consumable by --gene-panel
    panel = genes.load_panel("newds", path)
    assert panel == sel.panel


def _write_her2st_layout(root, rng, names=("A1", "B2", "C3"), n_spots=12, n_genes=25):
    """Minimal on-disk HER2ST layout: ST-cnts TSVs + ST-spotfiles."""
    import pandas as pd

    os.makedirs(root / "ST-cnts")
    os.makedirs(root / "ST-spotfiles")
    gene_names = [f"G{i}" for i in range(n_genes)]
    for name in names:
        xs = np.arange(n_spots) % 4 + 1
        ys = np.arange(n_spots) // 4 + 1
        counts = rng.poisson(4.0, size=(n_spots, n_genes))
        counts[:, :5] = rng.poisson(1.0, (n_spots, 5)) * rng.integers(0, 50, (n_spots, 5))
        idx = [f"{x}x{y}" for x, y in zip(xs, ys)]
        pd.DataFrame(counts, index=idx, columns=gene_names).to_csv(
            root / "ST-cnts" / f"{name}.tsv", sep="\t"
        )
        pd.DataFrame(
            {
                "x": xs, "y": ys,
                "pixel_x": xs * 100.0 + 7.3, "pixel_y": ys * 100.0 + 2.9,
            }
        ).to_csv(root / "ST-spotfiles" / f"{name}_selection.tsv", sep="\t", index=False)


def test_cli_select_panel_onboards_new_dataset(rng, tmp_path):
    """hvg --select-panel on a raw her2st-layout tree, then the produced
    panel drives the dataset loader — zero reference artifacts needed."""
    from mclstexp_tpu.cli.main import main
    from mclstexp_tpu.data.st_dataset import load_her2st

    _write_her2st_layout(tmp_path, rng)
    out = tmp_path / "panel_out"
    rc = main([
        "hvg", "--select-panel", "--dataset", "her2st",
        "--data-root", str(tmp_path), "--out", str(out),
        "--n-top-genes", "10", "--panel-size", "8",
    ])
    assert rc == 0
    panel_path = out / "her2st_hvg_panel.npy"
    panel = genes.load_panel("her2st", str(panel_path))
    assert len(panel) == 8

    sections = load_her2st(str(tmp_path), panel, with_patches=False)
    assert len(sections) == 3
    for s in sections:
        assert s.expression.shape == (12, 8)
        assert np.isfinite(s.expression).all()


def test_count_frames_read_gz_as_fetched(rng, tmp_path):
    """`cli fetch` leaves her2st counts and cscc stdata gzipped; the panel
    count-frame loaders must read them like the dataset loaders do
    (round-4 review finding: they crashed on exactly the layout fetch
    produces, contradicting fetch.py's docs)."""
    import gzip

    from mclstexp_tpu.data.panel import cscc_count_frames, her2st_count_frames

    # her2st: gzip every ST-cnts TSV in place
    her_root = tmp_path / "her"
    _write_her2st_layout(her_root, rng)
    for tsv in (her_root / "ST-cnts").iterdir():
        with open(tsv, "rb") as f, gzip.open(f"{tsv}.gz", "wb") as g:
            g.write(f.read())
        tsv.unlink()
    frames = her2st_count_frames(str(her_root))
    assert [f.name for f in frames] == ["A1", "B2", "C3"]
    assert all(np.isfinite(f.counts).all() for f in frames)

    # cscc: one gzipped stdata file is enough to pin the glob fallback
    import pandas as pd

    cscc_root = tmp_path / "cscc"
    cscc_root.mkdir()
    from mclstexp_tpu.data.st_dataset import cscc_section_names

    for name in cscc_section_names():
        df = pd.DataFrame(rng.poisson(3.0, size=(4, 5)),
                          index=[f"{i}x{i}" for i in range(4)],
                          columns=[f"G{i}" for i in range(5)])
        with gzip.open(cscc_root / f"GSM_{name}_stdata.tsv.gz", "wt") as f:
            f.write(df.to_csv(sep="\t"))
    frames = cscc_count_frames(str(cscc_root))
    assert len(frames) == 12
