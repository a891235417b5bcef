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


def test_streaming_topk_bf16_matches_bf16_dense(rng):
    """bf16 key storage (production HBM-halving mode): the streaming merge
    must equal a dense fp32-accumulated top-K over the SAME bf16-cast
    normalized inputs — pins the scan/merge logic independent of the input
    rounding — and retain high recall vs the fp32 ranking."""
    nk, nq, d, k = 1000, 13, 16, 7
    key = rng.normal(size=(nk, d)).astype(np.float32)
    query = rng.normal(size=(nq, d)).astype(np.float32)

    sv, si = retrieval.streaming_topk(
        jnp.asarray(key), jnp.asarray(query), top_k=k, chunk_size=128, bf16=True
    )
    kn = retrieval.l2_normalize(jnp.asarray(key)).astype(jnp.bfloat16)
    qn = retrieval.l2_normalize(jnp.asarray(query)).astype(jnp.bfloat16)
    scores = np.asarray(
        jnp.matmul(qn, kn.T, preferred_element_type=jnp.float32)
    )
    expected_idx = np.argsort(-scores, kind="stable", axis=1)[:, :k]
    np.testing.assert_array_equal(np.asarray(si), expected_idx)
    np.testing.assert_allclose(
        np.asarray(sv), np.take_along_axis(scores, expected_idx, 1), atol=1e-6
    )

    # recall vs the fp32 ranking: bf16 rounding may flip near-ties only
    _, di = retrieval.find_matches(jnp.asarray(key), jnp.asarray(query), top_k=k)
    overlap = np.mean([
        len(set(np.asarray(si)[i]) & set(np.asarray(di)[i])) / k
        for i in range(nq)
    ])
    assert overlap >= 0.9, overlap

    # plumbed through the production entry point without error
    expr = rng.normal(size=(nk, 5)).astype(np.float32)
    pe, px = retrieval.retrieve_and_aggregate(
        key, expr, query, top_k=k, weight_ord=2, streaming=True,
        streaming_bf16=True,
    )
    assert np.isfinite(pe).all() and np.isfinite(px).all()


def test_retrieve_and_aggregate_streaming_equals_dense(rng):
    """The production path's streaming switch (VERDICT r2 #5): forcing the
    memory-bounded scan gives bit-identical predictions to the dense path,
    and the auto threshold picks streaming at production key counts."""
    nk, nq, d, g, k = 500, 17, 8, 6, 9
    key = rng.normal(size=(nk, d)).astype(np.float32)
    expr = rng.normal(size=(nk, g)).astype(np.float32)
    query = rng.normal(size=(nq, d)).astype(np.float32)

    pe_d, px_d = retrieval.retrieve_and_aggregate(
        key, expr, query, top_k=k, weight_ord=1, streaming=False
    )
    pe_s, px_s = retrieval.retrieve_and_aggregate(
        key, expr, query, top_k=k, weight_ord=1, streaming=True
    )
    np.testing.assert_array_equal(px_s, px_d)
    np.testing.assert_array_equal(pe_s, pe_d)

    # auto mode: benchmark scale stays dense, production scale streams
    assert 13000 * 13000 < retrieval.STREAMING_SCORE_ELEMENTS  # her2st LOO
    assert 100_000 * 10_000_000 > retrieval.STREAMING_SCORE_ELEMENTS


def test_bleep_weighted_average_matches_notebook(rng):
    """weight_ord=-1 reproduces the reference notebook's weighted_average
    formula (BLEEP_inference.ipynb cell 5): np.average with weights
    exp(-(d_j^2 - d_0^2 + 1)) over the top-50, d_0 from the TOP-RANKED
    cosine match (quirk: not necessarily the smallest L2)."""
    nk, nq, d, g, k = 300, 9, 8, 5, 50
    key = rng.normal(size=(nk, d)).astype(np.float32)
    expr = rng.normal(size=(nk, g)).astype(np.float32)
    query = rng.normal(size=(nq, d)).astype(np.float32)

    kn = key / np.linalg.norm(key, axis=-1, keepdims=True)
    qn = query / np.linalg.norm(query, axis=-1, keepdims=True)
    indices = np.argsort(-(qn @ kn.T), axis=1)[:, :k]
    exp_emb = np.zeros((nq, d)); exp_expr = np.zeros((nq, g))
    for i in range(nq):
        a = np.sum((key[indices[i, 0]] - query[i]) ** 2)
        w = np.exp(-(np.sum((key[indices[i]] - query[i]) ** 2, axis=1) - a + 1))
        exp_emb[i] = np.average(key[indices[i]], axis=0, weights=w)
        exp_expr[i] = np.average(expr[indices[i]], axis=0, weights=w)

    pe, px = retrieval.retrieve_and_aggregate(
        key, expr, query, top_k=k, weight_ord=-1
    )
    np.testing.assert_allclose(pe, exp_emb, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(px, exp_expr, rtol=1e-4, atol=1e-5)


def test_masked_retrieval_equals_exclusion(rng):
    """The device-resident LOO form (full key set + held-out mask) selects
    and aggregates exactly what the reference's concat-the-others form does
    (evel_her2st.py:150-156), for dense AND streaming top-K."""
    sizes = [40, 55, 30]
    d, g, k = 8, 5, 6
    embs = [rng.normal(size=(n, d)).astype(np.float32) for n in sizes]
    exprs = [rng.normal(size=(n, g)).astype(np.float32) for n in sizes]
    full_emb = np.concatenate(embs)
    full_expr = np.concatenate(exprs)
    bounds = [(0, 40), (40, 95), (95, 125)]

    for fold in range(3):
        query = rng.normal(size=(11, d)).astype(np.float32)
        key_emb = np.concatenate([e for i, e in enumerate(embs) if i != fold])
        key_expr = np.concatenate([e for i, e in enumerate(exprs) if i != fold])
        pe_ref, px_ref = retrieval.retrieve_and_aggregate(
            key_emb, key_expr, query, top_k=k, weight_ord=1
        )
        mask = np.ones(sum(sizes), bool)
        mask[bounds[fold][0]:bounds[fold][1]] = False
        for streaming in (False, True):
            pe, px = retrieval.retrieve_and_aggregate(
                full_emb, full_expr, query, top_k=k, weight_ord=1,
                key_mask=mask, streaming=streaming,
            )
            np.testing.assert_allclose(px, px_ref, rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(pe, pe_ref, rtol=1e-5, atol=1e-6)


def test_evaluate_fold_resident_matches_host_path(rng):
    """infer.evaluate.evaluate_fold_resident == evaluate_fold metrics."""
    from mclstexp_tpu.infer import evaluate

    sizes = [30, 25, 35]
    d, g = 8, 6
    spot = [rng.normal(size=(n, d)).astype(np.float32) for n in sizes]
    img = [rng.normal(size=(n, d)).astype(np.float32) for n in sizes]
    expr = [rng.normal(size=(n, g)).astype(np.float32) for n in sizes]
    bounds = evaluate.section_bounds(sizes)
    spot_full = np.concatenate(spot)
    img_full = np.concatenate(img)
    expr_full = jnp.asarray(np.concatenate(expr))

    for fold in range(3):
        host = evaluate.evaluate_fold(fold, img[fold], spot, expr,
                                      top_k=7, weight_ord=2)
        dev = evaluate.evaluate_fold_resident(
            fold, img_full, spot_full, expr_full, bounds, expr[fold],
            top_k=7, weight_ord=2,
        )
        for key in host:
            np.testing.assert_allclose(dev[key], host[key], rtol=1e-5,
                                       err_msg=f"fold {fold} {key}")


def test_l2_normalize_zero_safe():
    x = jnp.zeros((2, 4))
    out = np.asarray(retrieval.l2_normalize(x))
    assert np.all(np.isfinite(out))


def test_topk_clamped_to_active_keys(rng):
    """top_k > unmasked key count must not leak masked (-inf-scored) rows
    into the prediction: masked rows get finite 1/d^2 weights once lax.top_k
    runs past the active set. retrieve_and_aggregate clamps K to the
    retrievable count (the reference's torch.topk errors outright there;
    clamping matches infer/serve.py's cap). Round-4 review finding."""
    from mclstexp_tpu.ops.retrieval import retrieve_and_aggregate

    nk, p, g = 12, 6, 4
    key_emb = rng.normal(size=(nk, p)).astype(np.float32)
    key_expr = np.zeros((nk, g), np.float32)
    key_expr[:3] = 1.0  # only the 3 active rows carry signal
    mask = np.zeros(nk, bool)
    mask[:3] = True
    query = rng.normal(size=(2, p)).astype(np.float32)

    _, pred = retrieve_and_aggregate(key_emb, key_expr, query, top_k=8,
                                     weight_ord=2, key_mask=mask)
    np.testing.assert_allclose(pred, 1.0, rtol=1e-6)  # no masked-zero dilution

    _, pred_s = retrieve_and_aggregate(key_emb, key_expr, query, top_k=8,
                                       weight_ord=2, key_mask=mask,
                                       streaming=True)
    np.testing.assert_allclose(pred_s, 1.0, rtol=1e-6)

    with pytest.raises(ValueError, match="deactivates every"):
        retrieve_and_aggregate(key_emb, key_expr, query, top_k=3,
                               weight_ord=2, key_mask=np.zeros(nk, bool))
