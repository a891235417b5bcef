"""Data-layer tests on synthetic fixtures (no real data needed)."""

import os

import numpy as np
import pytest

from mclstexp_tpu.data import hvg, normalize, pipeline, synthetic
from mclstexp_tpu.data.st_dataset import her2st_section_names, load_her2st


def test_library_size_normalize_rows_sum_to_rescale(rng):
    counts = rng.poisson(5.0, size=(10, 20)).astype(float)
    out = normalize.library_size_normalize(counts, rescale=10000.0)
    np.testing.assert_allclose(out.sum(1), 10000.0, rtol=1e-9)


def test_library_size_normalize_zero_rows_safe():
    counts = np.zeros((3, 5))
    out = normalize.library_size_normalize(counts)
    assert np.all(np.isfinite(out)) and np.all(out == 0)


def test_library_size_normalize_median_rescale(rng):
    counts = rng.poisson(5.0, size=(9, 12)).astype(float)
    out = normalize.library_size_normalize(counts, rescale="median")
    med = np.median(counts.sum(1))
    np.testing.assert_allclose(out.sum(1), med, rtol=1e-9)


def test_log_transform_base10():
    x = np.array([[0.0, 9.0, 99.0]])
    np.testing.assert_allclose(
        normalize.log_transform(x), np.array([[0.0, 1.0, 2.0]]), atol=1e-6
    )


def test_pergene_logcpm_is_per_gene(rng):
    """The eval-phase normalization (hvg scripts' genes x spots orientation,
    hvg_her2st.py:108,118-120): each GENE's unlogged values sum to the
    10,000 'library', and the result differs from the per-spot train-time
    normalization on the same counts."""
    counts = rng.poisson(6.0, size=(7, 11)).astype(np.float32) + 1.0
    out = normalize.pergene_logcpm(counts)
    assert out.shape == counts.shape and out.dtype == np.float32
    np.testing.assert_allclose(
        (10.0 ** out.astype(np.float64) - 1.0).sum(axis=0), 10000.0, rtol=1e-5
    )
    assert np.abs(out - normalize.logcpm_panel(counts)).max() > 0.01


def test_section_eval_expression():
    """Section.eval_expression: per-gene recompute from counts (cached), and
    pass-through when counts are absent (visium's already-per-gene load)."""
    from mclstexp_tpu.data.section import Section

    rng = np.random.default_rng(3)
    counts = rng.poisson(5.0, size=(6, 9)).astype(np.float32)
    expr = normalize.logcpm_panel(counts)
    pos = np.zeros((6, 2), np.int32)
    s = Section("s", expr, pos, pos, counts=counts)
    np.testing.assert_array_equal(s.eval_expression, normalize.pergene_logcpm(counts))
    assert s.eval_expression is s.eval_expression  # cached
    s2 = Section("t", expr, pos, pos, counts=None)
    assert s2.eval_expression is expr


def test_prepare_eval_arrays_eval_expression():
    """prepare_eval_arrays carries both normalizations; they alias when no
    section has counts."""
    from mclstexp_tpu.infer import embed

    sections = synthetic.make_dataset(num_sections=2, num_spots=10,
                                      num_genes=6, patch_size=8)
    prepared = embed.prepare_eval_arrays(sections)
    expect = np.concatenate([s.eval_expression for s in sections], axis=0)
    np.testing.assert_array_equal(np.asarray(prepared["eval_expression"]), expect)
    assert np.abs(np.asarray(prepared["eval_expression"])
                  - np.asarray(prepared["expression"])).max() > 0.01
    import dataclasses

    no_counts = [dataclasses.replace(s, counts=None) for s in sections]
    prepared2 = embed.prepare_eval_arrays(no_counts)
    assert prepared2["eval_expression"] is prepared2["expression"]


def test_normalize_total_median_target(rng):
    counts = rng.poisson(4.0, size=(8, 10)).astype(float)
    out = normalize.normalize_total(counts)
    med = np.median(counts.sum(1))
    np.testing.assert_allclose(out.sum(1), med, rtol=1e-9)


def test_hvg_selects_high_dispersion_genes(rng):
    """Bursty genes (same mean, much higher variance) must be selected over
    Poisson genes — they share a mean bin, so the z-score separates them."""
    n, g_poisson, g_bursty = 4000, 90, 10
    poisson = rng.poisson(5.0, size=(n, g_poisson)).astype(float)
    bursty = (rng.uniform(size=(n, g_bursty)) < 0.5) * 10.0  # mean 5, var 25
    log_data = np.log1p(np.concatenate([poisson, bursty], axis=1))
    mask = hvg.highly_variable_genes(log_data, n_top_genes=g_bursty)
    assert mask.sum() == g_bursty
    # Edge bins can hold a single gene (z := 1, a scanpy quirk), so allow a
    # stray pick — but the selection must be overwhelmingly the bursty genes.
    assert mask[g_poisson:].sum() >= g_bursty - 2


def test_hvg_union_intersection():
    masks = np.array([[1, 1, 0, 0], [1, 0, 1, 0]], dtype=bool)
    u, i = hvg.hvg_union_intersection(masks)
    np.testing.assert_array_equal(u, [True, True, True, False])
    np.testing.assert_array_equal(i, [True, False, False, False])


def test_synthetic_sections_are_consistent():
    sections = synthetic.make_dataset(num_sections=2, num_spots=20, num_genes=8)
    for s in sections:
        assert s.num_spots == 20 and s.num_genes == 8
        assert s.patches.shape == (20, 32, 32, 3)
        assert s.patches.dtype == np.uint8
        assert np.all(np.isfinite(s.expression))


def test_st_reader_roundtrip(tmp_path):
    """Write the synthetic HER2ST layout, read it back through the real reader."""
    root = str(tmp_path / "her2st")
    names, gene_names = synthetic.write_st_layout(root, num_sections=3, num_spots=9, num_genes=6)
    assert her2st_section_names(root) == names  # < 34 sections: no [1:33] cut
    sections = load_her2st(root, gene_names, cache_dir=str(tmp_path / "cache"))
    assert [s.name for s in sections] == names
    s = sections[0]
    assert s.expression.shape == (9, 6)
    assert s.patches.shape == (9, 224, 224, 3)
    # positions are array coords starting at 1 in the fixture
    assert s.positions.min() >= 1
    # patch cache hit on re-read
    sections2 = load_her2st(root, gene_names, cache_dir=str(tmp_path / "cache"))
    np.testing.assert_array_equal(np.asarray(sections2[0].patches), np.asarray(s.patches))


def test_st_reader_expression_matches_manual(tmp_path):
    import pandas as pd

    root = str(tmp_path / "her2st")
    names, gene_names = synthetic.write_st_layout(root, num_sections=1, num_spots=4, num_genes=5)
    sections = load_her2st(root, gene_names, with_patches=False)
    cnt = pd.read_csv(os.path.join(root, "ST-cnts", f"{names[0]}.tsv"), sep="\t", index_col=0)
    expected = normalize.logcpm_panel(cnt[gene_names].values)
    np.testing.assert_allclose(sections[0].expression, expected, atol=1e-6)


def test_pipeline_batching():
    sections = synthetic.make_dataset(num_sections=2, num_spots=20, num_genes=8)
    data = pipeline.ConcatSections.from_sections(sections)
    assert len(data) == 40

    batches = list(pipeline.train_batches(data, batch_size=16, seed=0, epoch=0))
    assert [len(b["expression"]) for b in batches] == [16, 16, 8]
    assert pipeline.num_train_steps(40, 16) == 3

    # epochs shuffle differently but cover everything
    b0 = list(pipeline.train_batches(data, 16, seed=0, epoch=0))
    b1 = list(pipeline.train_batches(data, 16, seed=0, epoch=1))
    assert not np.array_equal(b0[0]["expression"], b1[0]["expression"])

    ev = list(pipeline.eval_batches(data, 32))
    assert [len(b["expression"]) for b in ev] == [32, 8]
    np.testing.assert_array_equal(ev[0]["expression"][:20], sections[0].expression)


def test_split_fold():
    sections = synthetic.make_dataset(num_sections=3, num_spots=8, num_genes=4)
    train, test = pipeline.split_fold(sections, fold=1)
    assert test.name == "S2"
    assert [s.name for s in train] == ["S1", "S3"]


def test_prefetch_propagates_producer_errors():
    """A producer-thread crash must surface in the consumer, not silently
    truncate the epoch (round-4 review finding)."""
    import jax

    from mclstexp_tpu.data.pipeline import prefetch_to_device

    def batches():
        yield {"x": np.zeros((2, 3), np.float32)}
        raise RuntimeError("producer blew up")

    it = prefetch_to_device(batches())
    first = next(it)
    assert first["x"].shape == (2, 3)
    with pytest.raises(RuntimeError, match="producer blew up"):
        next(it)

    # clean iterators still terminate normally
    assert len(list(prefetch_to_device(iter([{"x": np.ones(1)}])))) == 1


def test_patch_cache_size_mismatch_is_a_miss(tmp_path):
    """A cache file cut at a different patch size must be re-cut, not loaded
    (the cache is keyed by section name only; round-4 review finding)."""
    from mclstexp_tpu.data import synthetic
    from mclstexp_tpu.data.st_dataset import load_her2st_section

    root = str(tmp_path / "tree")
    names, gene_names = synthetic.write_st_layout(
        root, num_sections=1, num_spots=4, num_genes=5)
    cache = tmp_path / "cache"

    s16 = load_her2st_section(root, names[0], gene_names, patch_size=16,
                              cache_dir=str(cache))
    assert s16.patches.shape[1:3] == (16, 16)
    s8 = load_her2st_section(root, names[0], gene_names, patch_size=8,
                             cache_dir=str(cache))
    assert s8.patches.shape[1:3] == (8, 8)  # stale 16px cache was a miss
    # and the re-cut result was cached at the new size
    assert np.load(cache / f"{names[0]}.npy", mmap_mode="r").shape[1:3] == (8, 8)


def test_her2st_section_names_slice_at_33(tmp_path):
    """The reference protocol slice [1:33] applies whenever the listing is
    >= 33 entries (dataset.py:155-161 slices unconditionally on the full
    checkout); a 33-file tree must NOT keep index 0."""
    from mclstexp_tpu.data.st_dataset import her2st_section_names

    cnts = tmp_path / "ST-cnts"
    cnts.mkdir()
    all_names = [f"{c}{d}" for c in "ABCDEFGHIJK" for d in "123"][:33]
    for nm in all_names:
        (cnts / f"{nm}.tsv").touch()
    names = her2st_section_names(str(tmp_path))
    assert names == sorted(all_names)[1:33]
    assert len(names) == 32

    # small (synthetic/test) trees keep all sections
    for f in list(cnts.iterdir())[3:]:
        f.unlink()
    assert len(her2st_section_names(str(tmp_path))) == 3
