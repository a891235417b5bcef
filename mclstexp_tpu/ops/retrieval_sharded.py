"""Mesh-sharded top-K retrieval + aggregation: the multi-chip serving path.

``ops/retrieval.py`` keeps the whole reference key set on ONE chip (dense
(Nq, Nk) scores, or the memory-bounded ``streaming_topk`` scan). Past a
single chip's HBM — the "millions of reference spots resident in HBM"
regime the reference's host-side NumPy loop (``evel_her2st.py:174-187``)
could never reach — the TPU-native answer is to shard the KEY database over
a mesh axis and let each chip own one contiguous slab:

  1. every device L2-normalizes its key shard and computes local cosine
     scores against the (replicated) query chunk on its MXU;
  2. a local ``lax.top_k`` reduces the shard to K candidates per query;
  3. one small ``all_gather`` over ICI merges the per-device candidates
     ((n_dev * K) values+indices per query — KBs, never the score matrix)
     and a final ``lax.top_k`` picks the global winners;
  4. each winner's embedding/expression row is fetched from its owning
     device by a masked local gather + ``psum`` (no device ever
     materializes the full key set);
  5. the 1/d^2 (or BLEEP) weighted aggregation runs replicated on the
     gathered (C, K, ·) tiles — identical math to the single-chip path.

Selection is bit-identical to ``find_matches`` including the deterministic
lowest-index tie-break: shards are contiguous index ranges, candidates
merge in shard order, and ``lax.top_k`` prefers the first occurrence among
equal scores (pinned against the dense path in
``tests/test_retrieval_sharded.py``).

Scaling: per-device compute and HBM fall as 1/n_dev (each chip scans
Nk/n_dev keys); the merge traffic is O(n_dev * K) scores + indices and the
row-fetch psum is O(C * K * (D + G)) — both independent of Nk, riding ICI.
The driver's multichip dry run executes this path on every round
(``__graft_entry__.dryrun_multichip``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mclstexp_tpu.ops.retrieval import (
    STREAMING_SCORE_ELEMENTS,
    aggregate_from_selected,
    l2_normalize,
    streaming_topk,
)


@functools.lru_cache(maxsize=32)
def _build_sharded_chunk_fn(
    mesh: Mesh, axis: str, top_k: int, s_per_dev: int, n_dev: int,
    weight_ord: int, local_streaming: bool,
):
    """One jitted shard_map program per (mesh, K, shard size, weighting) —
    cached so the LOO fold loop and repeated serving calls reuse it."""
    kk = min(top_k, s_per_dev)  # local candidates per shard

    def chunk_fn(k_shard, expr_shard, valid_shard, q):
        # k_shard (S, D), expr_shard (S, G), valid_shard (S,) — this
        # device's slab; q (C, D) replicated.
        my = jax.lax.axis_index(axis)
        if local_streaming:
            # per-shard memory-bounded scan (retrieval.streaming_topk):
            # shards past the dense score-matrix budget never materialize
            # (C, S) — mesh x streaming compose for billion-row databases
            lv, li = streaming_topk(k_shard, q, kk, key_mask=valid_shard)
        else:
            kn = l2_normalize(k_shard.astype(jnp.float32))
            qn = l2_normalize(q.astype(jnp.float32))
            scores = qn @ kn.T  # (C, S) local MXU matmul
            scores = jnp.where(valid_shard[None, :], scores, -jnp.inf)
            lv, li = jax.lax.top_k(scores, kk)
        gi = li + my * s_per_dev  # global key indices
        # merge: (n_dev, C, kk) -> (C, n_dev*kk) in shard order, so ties
        # resolve to the lowest GLOBAL index exactly like the dense path
        av = jax.lax.all_gather(lv, axis)
        ai = jax.lax.all_gather(gi, axis)
        c = av.shape[1]
        av = jnp.moveaxis(av, 0, 1).reshape(c, n_dev * kk)
        ai = jnp.moveaxis(ai, 0, 1).reshape(c, n_dev * kk)
        vals, pos = jax.lax.top_k(av, top_k)
        idx = jnp.take_along_axis(ai, pos, axis=1)  # (C, K) global winners
        # fetch each winner's row from its owner: masked local gather + psum
        local_idx = idx - my * s_per_dev
        owned = (local_idx >= 0) & (local_idx < s_per_dev)
        safe = jnp.clip(local_idx, 0, s_per_dev - 1)
        sel_emb = jnp.where(
            owned[..., None], jnp.take(k_shard, safe, axis=0), 0.0)
        sel_expr = jnp.where(
            owned[..., None], jnp.take(expr_shard, safe, axis=0), 0.0)
        sel_emb = jax.lax.psum(sel_emb, axis)
        sel_expr = jax.lax.psum(sel_expr, axis)
        pred_emb, pred_expr = aggregate_from_selected(
            sel_emb, sel_expr, q.astype(jnp.float32), weight_ord)
        return vals, idx, pred_emb, pred_expr

    spec, rep = P(axis), P()
    return jax.jit(jax.shard_map(
        chunk_fn, mesh=mesh,
        in_specs=(spec, spec, spec, rep),
        out_specs=(rep, rep, rep, rep),
        check_vma=False,
    ))


def sharded_retrieve_and_aggregate(
    key_emb,
    key_expr,
    query_emb,
    top_k: int,
    mesh: Mesh,
    weight_ord: int = 1,
    axis: str = "data",
    key_mask=None,
    query_chunk: int = 512,
    key_mask_count: "int | None" = None,
    return_matches: bool = False,
    local_streaming: "bool | None" = None,
):
    """``retrieve_and_aggregate`` with the key database sharded over
    ``mesh``'s ``axis`` — same results (selection bit-identical, aggregation
    fp32-tight), per-device memory and FLOPs divided by the axis size.

    key_emb (Nk, D) / key_expr (Nk, G) may be host or device arrays; they
    are placed (or re-laid-out) with ``NamedSharding(mesh, P(axis))`` —
    pass device arrays already sharded that way to keep a resident database
    across calls (the LOO fold loop's pattern, with ``key_mask`` flipping
    per fold). Queries are replicated and processed in padded
    ``query_chunk`` slices so one program serves any Nq.

    key_mask_count: optional number of True entries in ``key_mask`` when the
    mask is a device array (avoids a host readback for the K clamp).

    local_streaming: None (default) auto-switches each shard's local top-K
    to the memory-bounded ``streaming_topk`` scan when query_chunk x
    shard_size exceeds STREAMING_SCORE_ELEMENTS — mesh partitioning and
    streaming compose, so the per-device score materialization stays
    bounded at ANY database size; True/False forces the choice.
    """
    nk, d = key_emb.shape
    g = key_expr.shape[1]
    n_dev = mesh.shape[axis]
    nq = query_emb.shape[0]

    # K clamp, same rationale as retrieve_and_aggregate: -inf rows must
    # never carry finite aggregation weight.
    if key_mask is None:
        n_active = nk
    elif key_mask_count is not None:
        n_active = int(key_mask_count)
    else:
        n_active = int(np.asarray(key_mask).sum())
    if n_active == 0:
        raise ValueError("key_mask deactivates every retrievable key")
    top_k = min(top_k, n_active)

    # pad keys to a device multiple; padded rows are invalid (-inf scores)
    s_per_dev = -(-nk // n_dev)
    pad = s_per_dev * n_dev - nk
    shard = NamedSharding(mesh, P(axis))
    valid = (
        np.ones(nk, bool) if key_mask is None else np.asarray(key_mask, bool)
    )

    def _place(a, np_dtype):
        # Host arrays pad on the HOST and device_put straight to the
        # sharded layout (per-shard transfers — device 0 never holds the
        # full database, the regime this module exists for). Device arrays
        # re-lay-out in place when already a device multiple; the rare
        # non-divisible device-resident case pays one on-device concat.
        if isinstance(a, jax.Array):
            a = a.astype(np_dtype) if a.dtype != np_dtype else a
            if pad:
                a = jnp.concatenate(
                    [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
            return jax.device_put(a, shard)
        a = np.asarray(a, dtype=np_dtype)
        if pad:
            a = np.concatenate(
                [a, np.zeros((pad,) + a.shape[1:], a.dtype)])
        return jax.device_put(a, shard)

    k_dev = _place(key_emb, np.float32)
    e_dev = _place(key_expr, np.float32)
    v_dev = _place(valid, np.bool_)

    if local_streaming is None:
        local_streaming = query_chunk * s_per_dev > STREAMING_SCORE_ELEMENTS
    fn = _build_sharded_chunk_fn(
        mesh, axis, top_k, s_per_dev, n_dev, weight_ord, bool(local_streaming))

    query_j = jnp.asarray(query_emb, dtype=jnp.float32)
    vals_out, idx_out, emb_out, expr_out = [], [], [], []
    for start in range(0, nq, query_chunk):
        stop = min(start + query_chunk, nq)
        b = stop - start
        q = query_j[start:stop]
        if b < query_chunk:
            # pad the tail to the one static shape (zero queries are
            # harmless: their rows are sliced off before returning)
            q = jnp.concatenate(
                [q, jnp.zeros((query_chunk - b, q.shape[1]), q.dtype)])
        vals, idx, pe, px = fn(k_dev, e_dev, v_dev, q)
        vals_out.append(np.asarray(vals)[:b])
        idx_out.append(np.asarray(idx)[:b])
        emb_out.append(np.asarray(pe)[:b])
        expr_out.append(np.asarray(px)[:b])

    pred_emb = np.concatenate(emb_out, axis=0)
    pred_expr = np.concatenate(expr_out, axis=0)
    if return_matches:
        return (
            np.concatenate(vals_out, axis=0),
            np.concatenate(idx_out, axis=0),
            pred_emb,
            pred_expr,
        )
    return pred_emb, pred_expr
