"""Device-resident eval metrics vs the host fp64 scipy-golden path.

The LOO fold loop's host path reads back the full (N_fold, G) prediction
matrix per fold only to reduce it to four scalars (hvg/heg PCC, MSE, MAE —
``evel_her2st.py:193-221``). The device path computes the same bundle in
fp32 on-device and reads back one 4-vector; these tests pin its agreement
with the fp64 host implementation (including the NaN-drop and
NaN-propagation policies) to fp32 tolerance.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mclstexp_tpu.infer import evaluate, metrics
from mclstexp_tpu.ops import retrieval

RTOL = 3e-5
ATOL = 1e-5


def _assert_bundles_close(dev: dict, host: dict):
    assert set(dev) == set(host)
    for k in host:
        np.testing.assert_allclose(
            dev[k], host[k], rtol=RTOL, atol=ATOL, equal_nan=True,
            err_msg=f"metric {k}",
        )


def test_device_bundle_matches_host(rng):
    n, g = 64, 96
    pred = rng.normal(size=(n, g)).astype(np.float32)
    true = rng.normal(size=(n, g)).astype(np.float32)
    host = metrics.expression_metrics(pred, true)
    heg_idx = metrics.heg_indices(true, 50)
    dev = metrics.expression_metrics_device(
        jnp.asarray(pred), jnp.asarray(true), heg_idx
    )
    _assert_bundles_close(dev, host)


def test_device_bundle_nan_drop_constant_true_gene(rng):
    # A constant ground-truth gene yields NaN r: dropped from hvg_pcc
    # (evel_her2st.py:209) but NOT excluded from MSE/MAE.
    n, g = 40, 24
    pred = rng.normal(size=(n, g)).astype(np.float32)
    true = rng.normal(size=(n, g)).astype(np.float32)
    true[:, 3] = 1.25
    true[:, 17] = -0.5
    host = metrics.expression_metrics(pred, true)
    heg_idx = metrics.heg_indices(true, 50)  # clamped to g by argsort slice
    dev = metrics.expression_metrics_device(
        jnp.asarray(pred), jnp.asarray(true), heg_idx
    )
    assert np.isfinite(host["hvg_pcc"])
    _assert_bundles_close(dev, host)


def test_device_bundle_nan_propagates_into_heg(rng):
    # The reference takes the RAW mean over HEG PCCs — a constant gene
    # inside the HEG set poisons heg_pcc to NaN on both paths.
    n, g = 32, 16
    pred = rng.normal(size=(n, g)).astype(np.float32)
    true = rng.normal(size=(n, g)).astype(np.float32)
    true[:, 5] = 9.0  # constant AND highest-mean -> lands in the HEG set
    host = metrics.expression_metrics(pred, true, heg_k=4)
    heg_idx = metrics.heg_indices(true, 4)
    assert 5 in heg_idx
    dev = metrics.expression_metrics_device(
        jnp.asarray(pred), jnp.asarray(true), heg_idx
    )
    assert np.isnan(host["heg_pcc"]) and np.isnan(dev["heg_pcc"])
    _assert_bundles_close(dev, host)


def test_device_bundle_all_genes_invalid(rng):
    # Every gene constant in the ground truth: the host mean over an empty
    # valid set is NaN; the device path must agree, not return 0.
    n, g = 10, 6
    pred = rng.normal(size=(n, g)).astype(np.float32)
    true = np.ones((n, g), np.float32)
    with np.errstate(invalid="ignore"):
        host = metrics.expression_metrics(pred, true, heg_k=3)
    heg_idx = metrics.heg_indices(true, 3)
    dev = metrics.expression_metrics_device(
        jnp.asarray(pred), jnp.asarray(true), heg_idx
    )
    assert np.isnan(host["hvg_pcc"]) and np.isnan(dev["hvg_pcc"])
    _assert_bundles_close(dev, host)


def test_retrieve_and_aggregate_as_device_equals_host(rng):
    nk, nq, d, g, k = 150, 23, 12, 18, 6
    key_emb = rng.normal(size=(nk, d)).astype(np.float32)
    key_expr = rng.normal(size=(nk, g)).astype(np.float32)
    query = rng.normal(size=(nq, d)).astype(np.float32)
    host_emb, host_expr = retrieval.retrieve_and_aggregate(
        key_emb, key_expr, query, top_k=k, weight_ord=1, chunk_size=8
    )
    dev_emb, dev_expr = retrieval.retrieve_and_aggregate(
        key_emb, key_expr, query, top_k=k, weight_ord=1, chunk_size=8,
        as_device=True,
    )
    assert isinstance(dev_emb, jnp.ndarray) and isinstance(dev_expr, jnp.ndarray)
    np.testing.assert_allclose(np.asarray(dev_emb), host_emb, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dev_expr), host_expr, rtol=1e-6)


@pytest.mark.parametrize("weight_ord", [1, 2])
def test_fold_resident_device_metrics_matches_host(rng, weight_ord):
    # End-to-end: evaluate_fold_resident(device_metrics=True) returns the
    # same per-fold bundle as the host path on a 4-section LOO setup.
    p, g, k = 16, 20, 5
    sizes = [30, 41, 27, 36]
    spot = [rng.normal(size=(s, p)).astype(np.float32) for s in sizes]
    img = [rng.normal(size=(s, p)).astype(np.float32) for s in sizes]
    expr = [rng.normal(size=(s, g)).astype(np.float32) for s in sizes]
    bounds = evaluate.section_bounds(sizes)
    spot_full = jnp.asarray(np.concatenate(spot))
    img_full = jnp.asarray(np.concatenate(img))
    expr_full = jnp.asarray(np.concatenate(expr))
    for fold in range(len(sizes)):
        host = evaluate.evaluate_fold_resident(
            fold, img_full, spot_full, expr_full, bounds, expr[fold],
            top_k=k, weight_ord=weight_ord,
        )
        dev = evaluate.evaluate_fold_resident(
            fold, img_full, spot_full, expr_full, bounds, expr[fold],
            top_k=k, weight_ord=weight_ord, device_metrics=True,
        )
        _assert_bundles_close(dev, host)


def test_fold_resident_device_metrics_saves_predictions(rng, tmp_path):
    # prediction_path still writes the reference-layout genes x spots dump.
    p, g, k = 8, 10, 4
    sizes = [12, 15]
    spot = [rng.normal(size=(s, p)).astype(np.float32) for s in sizes]
    img = [rng.normal(size=(s, p)).astype(np.float32) for s in sizes]
    expr = [rng.normal(size=(s, g)).astype(np.float32) for s in sizes]
    bounds = evaluate.section_bounds(sizes)
    path = str(tmp_path / "pred.npy")
    evaluate.evaluate_fold_resident(
        0, jnp.asarray(np.concatenate(img)), jnp.asarray(np.concatenate(spot)),
        jnp.asarray(np.concatenate(expr)), bounds, expr[0],
        top_k=k, weight_ord=1, device_metrics=True, prediction_path=path,
    )
    dumped = np.load(path)
    assert dumped.shape == (g, sizes[0])
