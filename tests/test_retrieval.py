"""Goldens for the fused retrieval engine vs a direct NumPy implementation
of the published protocol (normalize -> topk -> 1/d^2 weighted average,
evel_her2st.py:74-84,174-187)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mclstexp_tpu.ops import retrieval


def np_protocol(key_emb, key_expr, query_emb, top_k, ord_):
    # Independent NumPy implementation of the retrieval protocol.
    kn = key_emb / np.linalg.norm(key_emb, axis=-1, keepdims=True)
    qn = query_emb / np.linalg.norm(query_emb, axis=-1, keepdims=True)
    scores = qn @ kn.T
    indices = np.argsort(-scores, axis=1)[:, :top_k]
    pred_emb = np.zeros((len(query_emb), key_emb.shape[1]))
    pred_expr = np.zeros((len(query_emb), key_expr.shape[1]))
    for i in range(len(query_emb)):
        d = np.linalg.norm(key_emb[indices[i]] - query_emb[i], axis=1, ord=ord_)
        w = 1.0 / d**2
        w = w / w.sum()
        pred_emb[i] = np.average(key_emb[indices[i]], axis=0, weights=w)
        pred_expr[i] = np.average(key_expr[indices[i]], axis=0, weights=w)
    return indices, pred_emb, pred_expr


@pytest.mark.parametrize("ord_", [1, 2])
def test_retrieve_and_aggregate_matches_numpy(rng, ord_):
    nk, nq, d, g, k = 200, 17, 16, 12, 8
    key_emb = rng.normal(size=(nk, d)).astype(np.float32)
    key_expr = rng.normal(size=(nk, g)).astype(np.float32)
    query = rng.normal(size=(nq, d)).astype(np.float32)

    exp_idx, exp_emb, exp_expr = np_protocol(key_emb, key_expr, query, k, ord_)
    pred_emb, pred_expr = retrieval.retrieve_and_aggregate(
        key_emb, key_expr, query, top_k=k, weight_ord=ord_, chunk_size=5
    )
    np.testing.assert_allclose(pred_emb, exp_emb, atol=1e-4)
    np.testing.assert_allclose(pred_expr, exp_expr, atol=1e-4)


def test_find_matches_topk_order(rng):
    nk, nq, d = 50, 4, 8
    key = rng.normal(size=(nk, d)).astype(np.float32)
    query = rng.normal(size=(nq, d)).astype(np.float32)
    vals, idx = retrieval.find_matches(jnp.asarray(key), jnp.asarray(query), top_k=5)
    vals, idx = np.asarray(vals), np.asarray(idx)

    kn = key / np.linalg.norm(key, axis=-1, keepdims=True)
    qn = query / np.linalg.norm(query, axis=-1, keepdims=True)
    scores = qn @ kn.T
    expected_idx = np.argsort(-scores, axis=1)[:, :5]
    np.testing.assert_array_equal(idx, expected_idx)
    np.testing.assert_allclose(vals, np.take_along_axis(scores, expected_idx, 1), atol=1e-5)
    # descending order
    assert np.all(np.diff(vals, axis=1) <= 1e-7)


def test_streaming_topk_matches_dense(rng):
    nk, nq, d, k = 1000, 13, 16, 7
    key = rng.normal(size=(nk, d)).astype(np.float32)
    query = rng.normal(size=(nq, d)).astype(np.float32)
    dv, di = retrieval.find_matches(jnp.asarray(key), jnp.asarray(query), top_k=k)
    sv, si = retrieval.streaming_topk(
        jnp.asarray(key), jnp.asarray(query), top_k=k, chunk_size=128
    )
    np.testing.assert_allclose(np.asarray(sv), np.asarray(dv), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(di))


def test_streaming_topk_unpadded_chunks(rng):
    # Nk an exact multiple of chunk_size and top_k > chunk remainder edge
    key = rng.normal(size=(256, 8)).astype(np.float32)
    query = rng.normal(size=(3, 8)).astype(np.float32)
    dv, di = retrieval.find_matches(jnp.asarray(key), jnp.asarray(query), top_k=10)
    sv, si = retrieval.streaming_topk(jnp.asarray(key), jnp.asarray(query), 10, 64)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(di))


def test_l2_normalize_zero_safe():
    x = jnp.zeros((2, 4))
    out = np.asarray(retrieval.l2_normalize(x))
    assert np.all(np.isfinite(out))
