"""Metric goldens vs scipy/sklearn (the reference's own metric backends)."""

import numpy as np
import pytest

from mclstexp_tpu.infer import metrics


def test_pearson_matches_scipy(rng):
    from scipy.stats import pearsonr

    n, g = 40, 7
    pred = rng.normal(size=(n, g))
    true = rng.normal(size=(n, g)) + 0.5 * pred
    r, p = metrics.pearson_per_gene(pred, true)
    for j in range(g):
        rr, pp = pearsonr(pred[:, j], true[:, j])
        np.testing.assert_allclose(r[j], rr, atol=1e-10)
        np.testing.assert_allclose(p[j], pp, rtol=1e-8)


def test_pearson_constant_column_nan(rng):
    pred = np.ones((10, 2))
    true = rng.normal(size=(10, 2))
    r, p = metrics.pearson_per_gene(pred, true)
    assert np.isnan(r).all()


def test_heg_indices_tie_breaking():
    # identical means: must reproduce np.argsort(...)[::-1] order exactly
    true = np.tile(np.array([[1.0, 2.0, 2.0, 0.5]]), (6, 1))
    idx = metrics.heg_indices(true, k=3)
    expected = np.argsort(true.mean(0))[::-1][:3]
    np.testing.assert_array_equal(idx, expected)


def test_mse_mae_match_sklearn(rng):
    from sklearn.metrics import mean_absolute_error, mean_squared_error

    pred = rng.normal(size=(20, 5))
    true = rng.normal(size=(20, 5))
    np.testing.assert_allclose(metrics.mse(pred, true), mean_squared_error(true, pred))
    np.testing.assert_allclose(metrics.mae(pred, true), mean_absolute_error(true, pred))


def test_expression_metrics_bundle(rng):
    n, g = 30, 60
    true = rng.normal(size=(n, g))
    pred = true + rng.normal(scale=0.1, size=(n, g))
    m = metrics.expression_metrics(pred, true)
    assert set(m) == {"hvg_pcc", "heg_pcc", "mse", "mae"}
    assert m["hvg_pcc"] > 0.9
    assert m["mse"] < 0.05


def test_cluster_predictions(rng):
    # two well-separated blobs labeled A/B + some undetermined spots
    a = rng.normal(size=(30, 10))
    b = rng.normal(size=(30, 10)) + 8.0
    x = np.concatenate([a, b, rng.normal(size=(5, 10))])
    labels = np.array(["A"] * 30 + ["B"] * 30 + ["undetermined"] * 5)
    out = metrics.cluster_predictions(x, labels)
    assert out["n_clusters"] == 2
    assert out["ari"] > 0.9
    assert out["nmi"] > 0.9
