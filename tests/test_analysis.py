"""Analysis-layer tests (gene ranking, plots, clustering wrapper)."""

import numpy as np
import pytest

from mclstexp_tpu.infer import analysis


def _sections(rng, s=3, n=40, g=6):
    truths = [rng.normal(size=(n, g)) for _ in range(s)]
    # gene 0 perfectly predicted, gene g-1 pure noise
    preds = []
    for t in truths:
        p = rng.normal(size=(n, g))
        p[:, 0] = t[:, 0]
        p[:, 1] = t[:, 1] + rng.normal(scale=0.3, size=n)
        preds.append(p)
    return preds, truths


def test_gene_ranking_orders_by_quality(rng):
    preds, truths = _sections(rng)
    genes = [f"G{i}" for i in range(6)]
    df = analysis.gene_ranking(preds, truths, genes)
    assert list(df.columns) == [
        "gene", "mean_pcc", "mean_neglog10_p", "best_section", "best_pcc"
    ]
    assert df.iloc[0]["gene"] == "G0"  # perfect gene ranks first
    assert df.iloc[0]["mean_pcc"] > 0.999
    assert df.iloc[1]["gene"] == "G1"


def test_spatial_plot_and_compare(tmp_path, rng):
    n, g = 25, 4
    centers = np.stack(np.meshgrid(np.arange(5), np.arange(5)), -1).reshape(-1, 2) * 50
    pred = rng.normal(size=(n, g))
    true = pred + rng.normal(scale=0.1, size=(n, g))
    out = str(tmp_path / "gene.png")
    fig = analysis.compare_gene_plot(centers, pred, true, ["A", "B", "C", "D"], "B", out)
    assert fig is not None
    import os

    assert os.path.getsize(out) > 0


def test_domain_clustering(rng):
    a = rng.normal(size=(20, 8))
    b = rng.normal(size=(20, 8)) + 6
    pred = np.concatenate([a, b])
    labels = np.array(["x"] * 20 + ["y"] * 20)
    out = analysis.domain_clustering(pred, labels)
    assert out["ari"] > 0.9


@pytest.mark.slow
def test_tutorial_example_end_to_end(tmp_path):
    """The worked example (reference tutorial.ipynb as a script) must run
    end to end: train -> dump -> retrieval predict -> gene ranking -> plot
    -> domain clustering (C17)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "tutorial_example",
        os.path.join(os.path.dirname(__file__), "..", "examples", "tutorial.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = tmp_path / "tut"
    mod.main(str(out), max_epochs=2)
    assert (out / "pred.npy").exists()
    pngs = list(out.glob("*.png"))
    assert pngs, "expected a spatial plot"
