"""Top-K cosine retrieval + inverse-square-distance aggregation, fused in XLA.

The reference's inference core is two pieces of host NumPy/Torch code:
  * ``find_matches`` — L2-normalize keys and queries, dot product, topk
    (reference ``evel_her2st.py:74-84``);
  * a Python loop over query spots computing 1/d^2 weights over the K
    retrieved *unnormalized* key embeddings and weighted-averaging their
    expression profiles (``evel_her2st.py:177-187`` — the slow part).

Here both fuse into one jitted call: the (Nq x Nk) score matmul rides the
MXU, `jax.lax.top_k` runs on-device, and the aggregation is two einsums over
gathered (Nq, K, ·) tiles. Queries are processed in chunks so the gathered
expression tile (chunk x K x G) stays well inside HBM at any key-set size.

Distance conventions (BASELINE.md): weights ∝ 1/d^2 with d = L1 distance for
HER2ST (``evel_her2st.py:178``), L2 for cSCC/Visium (``evel_cscc.py:209``,
``evel_visium.py:197``), computed on unnormalized embeddings.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    # torch F.normalize semantics: x / max(||x||, eps)
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


@functools.partial(jax.jit, static_argnames=("top_k",))
def find_matches(
    key_emb: jax.Array,
    query_emb: jax.Array,
    top_k: int,
    key_mask: "jax.Array | None" = None,
) -> Tuple[jax.Array, jax.Array]:
    """Cosine top-K: returns (values, indices), each (Nq, top_k).

    key_emb: (Nk, D) reference spot embeddings; query_emb: (Nq, D) image
    embeddings. Both are L2-normalized internally (the caller's arrays are
    untouched, matching ``evel_her2st.py:74-84``).

    key_mask: optional (Nk,) bool; False rows can never be retrieved. This
    is how the LOO protocol keeps the FULL key set device-resident across
    folds: instead of re-concatenating the 31 kept sections per fold
    (reference ``evel_her2st.py:150-156``), the held-out section's rows are
    masked out — identical selection, zero per-fold H2D.

    Tie-break (documented divergence): among exactly tied scores,
    ``lax.top_k`` deterministically returns the lowest indices; the
    reference's ``torch.topk`` (``evel_her2st.py:82``) is UNSPECIFIED there
    (probed on CPU: arbitrary subset, arbitrary order). Ties require
    bit-identical spot embeddings, unreachable in the reference's default
    flow, and whenever the protocol output is well-defined under ties the
    two agree (tests: test_quirks.test_topk_tie_break_quirk,
    test_reference_eval_ab.test_her2st_phase_b_tie_break_ab).
    """
    k = l2_normalize(key_emb.astype(jnp.float32))
    q = l2_normalize(query_emb.astype(jnp.float32))
    scores = q @ k.T  # (Nq, Nk) — MXU matmul
    if key_mask is not None:
        scores = jnp.where(key_mask[None, :], scores, -jnp.inf)
    return jax.lax.top_k(scores, top_k)


@functools.partial(jax.jit, static_argnames=("top_k", "chunk_size", "bf16"))
def streaming_topk(
    key_emb: jax.Array,
    query_emb: jax.Array,
    top_k: int,
    chunk_size: int = 4096,
    key_mask: "jax.Array | None" = None,
    bf16: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Memory-bounded cosine top-K over arbitrarily large key sets.

    `find_matches` materializes the (Nq, Nk) score matrix; at production
    retrieval scale (millions of reference spots resident in HBM) that
    matrix dwarfs the embeddings themselves. This version streams keys in
    chunks under `lax.scan`: each step is one (Nq, C) MXU matmul merged into
    a running (Nq, top_k) buffer via `lax.top_k` over top_k + C candidates —
    peak memory O(Nq * (top_k + C)), bit-identical ordering to the dense
    path for distinct scores.

    bf16: store the L2-NORMALIZED keys/queries as bfloat16 — the scan is
    HBM-bound on reading the key matrix, so this halves the streamed bytes;
    the MXU takes bf16 inputs natively and the matmul still ACCUMULATES in
    fp32 (``preferred_element_type``), so only the inputs round (~8 bits of
    cosine-score mantissa). Ranking can flip for near-ties — an opt-in
    production mode, not the parity default (the reference's find_matches is
    fp32 throughout, ``evel_her2st.py:74-84``). Normalization happens in
    fp32 BEFORE the cast. The returned values are the fp32-accumulated
    scores of the bf16 inputs.
    """
    q = l2_normalize(query_emb.astype(jnp.float32))
    k = l2_normalize(key_emb.astype(jnp.float32))
    if bf16:
        q = q.astype(jnp.bfloat16)
        k = k.astype(jnp.bfloat16)
    nk, d = k.shape
    nq = q.shape[0]

    valid_full = (
        jnp.ones(nk, bool) if key_mask is None else key_mask.astype(bool)
    )
    pad = (-nk) % chunk_size
    if pad:
        k = jnp.concatenate([k, jnp.zeros((pad, d), k.dtype)])
        valid_full = jnp.concatenate([valid_full, jnp.zeros(pad, bool)])
    n_chunks = k.shape[0] // chunk_size
    k_chunks = k.reshape(n_chunks, chunk_size, d)
    valid_chunks = valid_full.reshape(n_chunks, chunk_size)

    init_vals = jnp.full((nq, top_k), -jnp.inf, jnp.float32)
    init_idx = jnp.zeros((nq, top_k), jnp.int32)

    def body(carry, inp):
        vals, idx = carry
        chunk_i, k_chunk, chunk_valid = inp
        scores = jnp.matmul(
            q, k_chunk.T, preferred_element_type=jnp.float32
        )  # (Nq, C) — fp32 accumulation even for bf16 inputs
        cand_idx = chunk_i * chunk_size + jax.lax.broadcasted_iota(
            jnp.int32, (nq, chunk_size), 1
        )
        # padded keys (zero vectors) and caller-masked keys score -inf
        scores = jnp.where(chunk_valid[None, :], scores, -jnp.inf)
        all_vals = jnp.concatenate([vals, scores], axis=1)
        all_idx = jnp.concatenate([idx, cand_idx], axis=1)
        new_vals, pos = jax.lax.top_k(all_vals, top_k)
        new_idx = jnp.take_along_axis(all_idx, pos, axis=1)
        return (new_vals, new_idx), None

    (vals, idx), _ = jax.lax.scan(
        body, (init_vals, init_idx), (jnp.arange(n_chunks), k_chunks, valid_chunks)
    )
    return vals, idx


def aggregate_from_selected(
    sel_emb: jax.Array,  # (C, K, D) retrieved unnormalized embeddings
    sel_expr: jax.Array,  # (C, K, G) retrieved expression profiles
    query_chunk: jax.Array,  # (C, D) unnormalized queries
    weight_ord: int,
) -> Tuple[jax.Array, jax.Array]:
    """Protocol weighting + weighted average over gathered top-K tiles —
    shared by the single-chip path below and the mesh-sharded engine
    (``ops/retrieval_sharded.py``, where the tiles arrive via psum)."""
    if weight_ord == 0:
        # uniform weights — BLEEP's "average" retrieval mode
        # (reference BLEEP_inference.ipynb cell 5)
        k = sel_emb.shape[1]
        w = jnp.full(sel_emb.shape[:2], 1.0 / k, jnp.float32)
    elif weight_ord == -1:
        # BLEEP's "weighted_average" mode (BLEEP_inference.ipynb cell 5):
        # w_j = exp(-(d_j^2 - d_0^2 + 1)) over the top-K, where d^2 is the
        # squared L2 distance to the query and d_0^2 belongs to the
        # TOP-RANKED (by cosine) match — reproduced including that quirk
        # (d_0 is not necessarily the smallest L2 distance).
        diff = sel_emb - query_chunk[:, None, :]
        d2 = jnp.sum(jnp.square(diff), axis=-1)  # (C, K)
        w = jnp.exp(-(d2 - d2[:, :1] + 1.0))
        w = w / jnp.sum(w, axis=-1, keepdims=True)
    else:
        diff = sel_emb - query_chunk[:, None, :]
        if weight_ord == 1:
            d = jnp.sum(jnp.abs(diff), axis=-1)
        else:
            d = jnp.sqrt(jnp.sum(jnp.square(diff), axis=-1))
        w = 1.0 / jnp.square(d)
        w = w / jnp.sum(w, axis=-1, keepdims=True)  # (C, K)
    pred_emb = jnp.einsum("ck,ckd->cd", w, sel_emb, preferred_element_type=jnp.float32)
    pred_expr = jnp.einsum(
        "ck,ckg->cg", w, sel_expr, preferred_element_type=jnp.float32
    )
    return pred_emb, pred_expr


@functools.partial(jax.jit, static_argnames=("weight_ord",))
def _aggregate_chunk(
    key_emb: jax.Array,  # (Nk, D) unnormalized
    key_expr: jax.Array,  # (Nk, G)
    query_chunk: jax.Array,  # (C, D) unnormalized
    indices: jax.Array,  # (C, K)
    weight_ord: int,
) -> Tuple[jax.Array, jax.Array]:
    sel_emb = jnp.take(key_emb, indices, axis=0)  # (C, K, D)
    sel_expr = jnp.take(key_expr, indices, axis=0)  # (C, K, G)
    return aggregate_from_selected(sel_emb, sel_expr, query_chunk, weight_ord)


# Above this many score-matrix elements the dense (Nq, Nk) materialization
# is ~>2 GB fp32 and streaming_topk takes over (same ordering for distinct
# scores; peak memory O(Nq * (top_k + chunk))).
STREAMING_SCORE_ELEMENTS = 512 * 1024 * 1024


def retrieve_and_aggregate(
    key_emb: np.ndarray,
    key_expr: np.ndarray,
    query_emb: np.ndarray,
    top_k: int,
    weight_ord: int = 1,
    chunk_size: int = 1024,
    streaming: "bool | None" = None,
    key_mask=None,
    streaming_bf16: bool = False,
    as_device: bool = False,
) -> "Tuple[np.ndarray, np.ndarray] | Tuple[jax.Array, jax.Array]":
    """Full retrieval inference: (pred_embeddings, pred_expression) —
    host ndarrays by default, device arrays under ``as_device=True``.

    key_emb (Nk, D), key_expr (Nk, G), query_emb (Nq, D) -> (Nq, D), (Nq, G).
    Replaces the reference's find_matches + per-spot Python aggregation loop
    (``evel_her2st.py:174-187``) with device-resident fused compute.
    weight_ord: 1 = L1 1/d^2 (her2st), 2 = L2 1/d^2 (cscc/visium),
    0 = uniform (BLEEP "average" mode), -1 = BLEEP "weighted_average"
    (exp(-(d^2 - d_top^2 + 1)) over the top-K).

    streaming: None (default) auto-switches to the memory-bounded
    ``streaming_topk`` scan when Nq * Nk exceeds STREAMING_SCORE_ELEMENTS —
    the production path for reference sets far beyond benchmark scale
    (millions of spots resident in HBM); True/False forces the choice.

    key_mask: optional (Nk,) bool — False rows are unretrievable. Lets the
    LOO protocol keep one device-resident key set across folds (see
    ``find_matches``); device arrays passed for key_emb/key_expr are used
    in place (no copy).

    streaming_bf16: opt-in bf16 storage for the streamed normalized keys
    (halves the scan's HBM traffic; fp32 accumulation — see
    ``streaming_topk``). Only affects the streaming path; aggregation stays
    fp32 on the original unnormalized embeddings either way.

    as_device: return device arrays instead of host ndarrays — for
    consumers that keep reducing on-device (the device-metrics fold loop,
    ``infer/evaluate.evaluate_fold_resident(device_metrics=True)``), so the
    (Nq, G) prediction never crosses the host link.
    """
    key_emb_j = jnp.asarray(key_emb, dtype=jnp.float32)
    key_expr_j = jnp.asarray(key_expr, dtype=jnp.float32)
    query_j = jnp.asarray(query_emb, dtype=jnp.float32)
    nq = query_j.shape[0]
    nk = key_emb_j.shape[0]
    mask_j = None if key_mask is None else jnp.asarray(key_mask, dtype=bool)

    # Clamp K to the RETRIEVABLE key count: lax.top_k past it would return
    # -inf-scored masked/out-of-range rows whose finite 1/d^2 weights then
    # leak them into the prediction — for the LOO protocol that means the
    # held-out section's own spots (silent self-leakage). The reference's
    # torch.topk errors outright when k exceeds the key count; clamping is
    # the serving-grade behavior (same as infer/serve.py's cap) and
    # identical whenever K <= keys, i.e. on every reference protocol.
    # (summing the caller's array, not mask_j: fold masks are built on the
    # host, so this costs nothing; a device-array mask pays one readback)
    n_active = nk if key_mask is None else int(np.asarray(key_mask).sum())
    if n_active == 0:
        raise ValueError("key_mask deactivates every retrievable key")
    top_k = min(top_k, n_active)

    if streaming is None:
        streaming = nq * nk > STREAMING_SCORE_ELEMENTS
    if streaming:
        _, indices = streaming_topk(
            key_emb_j, query_j, top_k, key_mask=mask_j, bf16=streaming_bf16
        )
    else:
        _, indices = find_matches(key_emb_j, query_j, top_k, key_mask=mask_j)

    pred_embs, pred_exprs = [], []
    for start in range(0, nq, chunk_size):
        stop = min(start + chunk_size, nq)
        b = stop - start
        chunk_q = query_j[start:stop]
        chunk_i = indices[start:stop]
        if b < chunk_size:
            # Pad the tail chunk to the one static shape so _aggregate_chunk
            # compiles once per (chunk_size, K, D, G) across every call —
            # the 32-fold LOO sweep would otherwise recompile per distinct
            # query-count remainder (expensive over the remote-TPU tunnel).
            chunk_q = jnp.concatenate(
                [chunk_q, jnp.zeros((chunk_size - b, chunk_q.shape[1]), chunk_q.dtype)])
            chunk_i = jnp.concatenate(
                [chunk_i, jnp.zeros((chunk_size - b, chunk_i.shape[1]), chunk_i.dtype)])
        pe, px = _aggregate_chunk(key_emb_j, key_expr_j, chunk_q, chunk_i, weight_ord)
        if as_device:
            pred_embs.append(pe[:b])
            pred_exprs.append(px[:b])
        else:
            pred_embs.append(np.asarray(pe)[:b])
            pred_exprs.append(np.asarray(px)[:b])
    if as_device:
        if len(pred_embs) == 1:
            return pred_embs[0], pred_exprs[0]
        return jnp.concatenate(pred_embs, axis=0), jnp.concatenate(pred_exprs, axis=0)
    return np.concatenate(pred_embs, axis=0), np.concatenate(pred_exprs, axis=0)
