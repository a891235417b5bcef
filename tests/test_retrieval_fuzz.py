"""Property-style fuzz over the fused retrieval/aggregation path vs an
independent NumPy transcription of the published protocol (VERDICT r4
next #5a).

Every trial draws random shapes (including ragged LOO-style section masks),
a random K that may exceed the retrievable key count (the clamp path), a
random weight_ord from all four shipped modes, a random aggregation chunk
size (remainder-tail path), and a random dense/streaming choice with a
random scan chunk — then asserts the production entry point equals the
NumPy protocol: L2-normalize -> cosine argsort -> weights on UNNORMALIZED
embeddings (1/d^2 L1|L2: evel_her2st.py:178 / evel_cscc.py:209; uniform and
exp(-(d^2-d_0^2+1)): BLEEP_inference.ipynb cell 5) -> np.average.

The bf16 streaming mode is fuzzed separately: its ranking is allowed to
flip only on near-ties, so it is pinned against a dense fp32-accumulated
top-K over the SAME bf16-cast inputs (exact) plus a recall floor vs fp32.

Seeds are fixed per trial index — failures reproduce exactly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mclstexp_tpu.ops import retrieval


def np_protocol(key_emb, key_expr, query_emb, top_k, ord_, mask=None):
    """Independent NumPy transcription, extended with the LOO mask and the
    K-clamp semantics documented on retrieve_and_aggregate."""
    n_active = len(key_emb) if mask is None else int(mask.sum())
    k = min(top_k, n_active)
    kn = key_emb / np.linalg.norm(key_emb, axis=-1, keepdims=True)
    qn = query_emb / np.linalg.norm(query_emb, axis=-1, keepdims=True)
    scores = qn @ kn.T
    if mask is not None:
        scores = np.where(mask[None, :], scores, -np.inf)
    indices = np.argsort(-scores, kind="stable", axis=1)[:, :k]
    pred_emb = np.zeros((len(query_emb), key_emb.shape[1]))
    pred_expr = np.zeros((len(query_emb), key_expr.shape[1]))
    for i in range(len(query_emb)):
        sel = key_emb[indices[i]]
        if ord_ == 0:
            w = np.ones(k)
        elif ord_ == -1:
            d2 = np.sum((sel - query_emb[i]) ** 2, axis=1)
            w = np.exp(-(d2 - d2[0] + 1.0))
        else:
            d = np.linalg.norm(sel - query_emb[i], axis=1, ord=ord_)
            w = 1.0 / d**2
        pred_emb[i] = np.average(sel, axis=0, weights=w)
        pred_expr[i] = np.average(key_expr[indices[i]], axis=0, weights=w)
    return indices, pred_emb, pred_expr


# Quantized dims keep the number of distinct jit shapes (compiles) bounded
# while nk/nq/K/masks vary freely across trials.
DIMS = [4, 16]
GENES = [3, 10]


@pytest.mark.parametrize("trial", range(12))
def test_fuzz_retrieve_and_aggregate_matches_numpy(trial):
    r = np.random.default_rng(1000 + trial)
    nk = int(r.integers(3, 300))
    nq = int(r.integers(1, 40))
    d = int(r.choice(DIMS))
    g = int(r.choice(GENES))
    # K may exceed nk (and the unmasked count) — exercises the clamp
    top_k = int(r.integers(1, nk + 8))
    ord_ = int(r.choice([-1, 0, 1, 2]))
    chunk_size = int(r.integers(1, nq + 5))
    streaming = bool(r.integers(0, 2))
    scan_chunk = int(r.choice([1, 7, 64, 4096]))  # incl. chunk > nk (pad)

    key_emb = r.normal(size=(nk, d)).astype(np.float32)
    key_expr = r.normal(size=(nk, g)).astype(np.float32)
    query = r.normal(size=(nq, d)).astype(np.float32)

    # ~half the trials use a ragged LOO-style mask: random section sizes,
    # one section held out (never retrievable)
    mask = None
    if r.integers(0, 2):
        sizes, rem = [], nk
        while rem > 0:
            s = int(r.integers(1, rem + 1))
            sizes.append(s)
            rem -= s
        bounds = np.cumsum([0] + sizes)
        held = int(r.integers(0, len(sizes)))
        mask = np.ones(nk, bool)
        mask[bounds[held]:bounds[held + 1]] = False
        if not mask.any():  # single-section draw: keep one key retrievable
            mask[int(r.integers(0, nk))] = True

    exp_idx, exp_emb, exp_expr = np_protocol(
        key_emb, key_expr, query, top_k, ord_, mask
    )
    pred_emb, pred_expr = retrieval.retrieve_and_aggregate(
        key_emb, key_expr, query, top_k=top_k, weight_ord=ord_,
        chunk_size=chunk_size, streaming=streaming, key_mask=mask,
    )
    ctx = (f"trial={trial} nk={nk} nq={nq} d={d} g={g} k={top_k} "
           f"ord={ord_} chunk={chunk_size} streaming={streaming} "
           f"scan_chunk={scan_chunk} masked={mask is not None}")
    np.testing.assert_allclose(pred_emb, exp_emb, atol=2e-4, err_msg=ctx)
    np.testing.assert_allclose(pred_expr, exp_expr, atol=2e-4, err_msg=ctx)

    # the streaming scan itself under the random chunk (pad + merge paths)
    if streaming:
        k_eff = min(top_k, nk if mask is None else int(mask.sum()))
        _, si = retrieval.streaming_topk(
            jnp.asarray(key_emb), jnp.asarray(query), k_eff,
            chunk_size=scan_chunk,
            key_mask=None if mask is None else jnp.asarray(mask),
        )
        np.testing.assert_array_equal(np.asarray(si), exp_idx, err_msg=ctx)


@pytest.mark.parametrize("trial", range(4))
def test_fuzz_streaming_bf16_ranking(trial):
    """bf16 key storage: exact vs a dense top-K over the SAME bf16-cast
    normalized inputs (pins the scan/merge independent of input rounding);
    ranking flips vs fp32 are bounded (near-ties only)."""
    r = np.random.default_rng(2000 + trial)
    nk = int(r.integers(50, 600))
    nq = int(r.integers(1, 20))
    d = int(r.choice(DIMS))
    k = int(r.integers(1, 16))
    scan_chunk = int(r.choice([32, 128, 1024]))

    key = r.normal(size=(nk, d)).astype(np.float32)
    query = r.normal(size=(nq, d)).astype(np.float32)

    sv, si = retrieval.streaming_topk(
        jnp.asarray(key), jnp.asarray(query), top_k=k,
        chunk_size=scan_chunk, bf16=True,
    )
    kn = retrieval.l2_normalize(jnp.asarray(key)).astype(jnp.bfloat16)
    qn = retrieval.l2_normalize(jnp.asarray(query)).astype(jnp.bfloat16)
    scores = np.asarray(jnp.matmul(qn, kn.T, preferred_element_type=jnp.float32))
    exp_idx = np.argsort(-scores, kind="stable", axis=1)[:, :k]
    ctx = f"trial={trial} nk={nk} nq={nq} d={d} k={k} chunk={scan_chunk}"
    np.testing.assert_array_equal(np.asarray(si), exp_idx, err_msg=ctx)
    np.testing.assert_allclose(
        np.asarray(sv), np.take_along_axis(scores, exp_idx, 1),
        atol=1e-6, err_msg=ctx,
    )

    # fp32-ranking recall: any index that differs must be a near-tie in the
    # fp32 scores (within bf16's ~2^-8 relative rounding of cosine scores)
    kn32 = np.asarray(retrieval.l2_normalize(jnp.asarray(key)))
    qn32 = np.asarray(retrieval.l2_normalize(jnp.asarray(query)))
    s32 = qn32 @ kn32.T
    idx32 = np.argsort(-s32, kind="stable", axis=1)[:, :k]
    for i in range(nq):
        flipped = set(np.asarray(si)[i]) ^ set(idx32[i])
        for j in flipped:
            kth = s32[i, idx32[i, -1]]
            assert abs(s32[i, j] - kth) < 1e-2, (ctx, i, j)
