"""Mesh-sharded retrieval vs the single-device dense path.

The sharded engine (``ops/retrieval_sharded.py``) must reproduce
``retrieve_and_aggregate`` exactly: selection bit-identical (including the
deterministic lowest-index tie-break) and aggregation fp32-tight, for any
key count (divisible by the mesh or not), any weight_ord, LOO masks, and
multi-chunk query sets. Runs on the suite's 8-virtual-device CPU mesh.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mclstexp_tpu.ops import retrieval
from mclstexp_tpu.ops.retrieval_sharded import sharded_retrieve_and_aggregate
from mclstexp_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh((8,), ("data",))


@pytest.mark.parametrize("weight_ord", [1, 2, 0, -1])
def test_sharded_matches_dense(rng, mesh, weight_ord):
    nk, nq, d, g, k = 333, 29, 16, 12, 7  # nk NOT a device multiple
    key_emb = rng.normal(size=(nk, d)).astype(np.float32)
    key_expr = rng.normal(size=(nk, g)).astype(np.float32)
    query = rng.normal(size=(nq, d)).astype(np.float32)

    ref_emb, ref_expr = retrieval.retrieve_and_aggregate(
        key_emb, key_expr, query, top_k=k, weight_ord=weight_ord)
    _, ref_idx = retrieval.find_matches(
        jnp.asarray(key_emb), jnp.asarray(query), top_k=k)

    vals, idx, emb, expr = sharded_retrieve_and_aggregate(
        key_emb, key_expr, query, top_k=k, mesh=mesh, weight_ord=weight_ord,
        return_matches=True)
    np.testing.assert_array_equal(idx, np.asarray(ref_idx))
    np.testing.assert_allclose(emb, ref_emb, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(expr, ref_expr, rtol=2e-5, atol=1e-6)
    assert np.all(np.diff(vals, axis=1) <= 1e-7)  # descending scores


def test_sharded_loo_mask_matches_dense(rng, mesh):
    # the fold pattern: full key set resident, held-out section masked
    nk, nq, d, g, k = 240, 17, 8, 10, 9
    key_emb = rng.normal(size=(nk, d)).astype(np.float32)
    key_expr = rng.normal(size=(nk, g)).astype(np.float32)
    query = rng.normal(size=(nq, d)).astype(np.float32)
    mask = np.ones(nk, bool)
    mask[60:140] = False  # spans shard boundaries of the 8-way layout

    ref_emb, ref_expr = retrieval.retrieve_and_aggregate(
        key_emb, key_expr, query, top_k=k, weight_ord=1, key_mask=mask)
    emb, expr = sharded_retrieve_and_aggregate(
        key_emb, key_expr, query, top_k=k, mesh=mesh, weight_ord=1,
        key_mask=mask)
    np.testing.assert_allclose(emb, ref_emb, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(expr, ref_expr, rtol=2e-5, atol=1e-6)
    # masked rows can never be selected
    _, idx, _, _ = sharded_retrieve_and_aggregate(
        key_emb, key_expr, query, top_k=k, mesh=mesh, weight_ord=1,
        key_mask=mask, return_matches=True)
    assert not np.isin(idx, np.arange(60, 140)).any()


def test_sharded_topk_clamp_and_small_shards(rng, mesh):
    # K > active keys: clamps like the dense path; shards smaller than K
    nk, nq, d, g = 20, 5, 6, 4  # 8-way mesh -> shards of 3 (padded)
    key_emb = rng.normal(size=(nk, d)).astype(np.float32)
    key_expr = rng.normal(size=(nk, g)).astype(np.float32)
    query = rng.normal(size=(nq, d)).astype(np.float32)
    mask = np.zeros(nk, bool)
    mask[[2, 5, 11, 19]] = True

    ref_emb, ref_expr = retrieval.retrieve_and_aggregate(
        key_emb, key_expr, query, top_k=50, weight_ord=2, key_mask=mask)
    _, idx, emb, expr = sharded_retrieve_and_aggregate(
        key_emb, key_expr, query, top_k=50, mesh=mesh, weight_ord=2,
        key_mask=mask, return_matches=True)
    assert idx.shape == (nq, 4)  # clamped to the 4 active keys
    assert set(np.unique(idx)) == {2, 5, 11, 19}
    np.testing.assert_allclose(emb, ref_emb, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(expr, ref_expr, rtol=2e-5, atol=1e-6)

    with pytest.raises(ValueError, match="deactivates every"):
        sharded_retrieve_and_aggregate(
            key_emb, key_expr, query, top_k=3, mesh=mesh,
            key_mask=np.zeros(nk, bool))


def test_sharded_tie_break_lowest_global_index(rng, mesh):
    # Duplicate key rows across different shards: exactly tied scores must
    # resolve to the LOWEST global indices, matching find_matches' pin
    # (test_quirks.test_topk_tie_break_quirk).
    nk, d, g = 64, 8, 5
    base = rng.normal(size=(nk, d)).astype(np.float32)
    base[40] = base[3]   # tie spanning shards 0 and 5
    base[41] = base[3]
    base[9] = base[8]    # tie within shard 1
    key_expr = rng.normal(size=(nk, g)).astype(np.float32)
    query = np.stack([base[3], base[8]]).astype(np.float32)

    _, ref_idx = retrieval.find_matches(
        jnp.asarray(base), jnp.asarray(query), top_k=6)
    _, idx, _, _ = sharded_retrieve_and_aggregate(
        base, key_expr, query, top_k=6, mesh=mesh, weight_ord=0,
        return_matches=True)
    np.testing.assert_array_equal(idx, np.asarray(ref_idx))
    assert idx[0, 0] == 3  # the lowest-index duplicate wins for query 0


@pytest.mark.parametrize("trial", range(8))
def test_fuzz_sharded_matches_dense(mesh, trial):
    # Random shapes/masks/K/weights vs the dense engine (which is itself
    # fuzz-pinned to the NumPy protocol in test_retrieval_fuzz.py) —
    # selection must be index-identical, aggregation fp32-tight.
    r = np.random.default_rng(3000 + trial)
    nk = int(r.integers(9, 260))  # > 8 so every device can own >= 1 row
    nq = int(r.integers(1, 30))
    d = int(r.choice([4, 16]))
    g = int(r.choice([3, 10]))
    top_k = int(r.integers(1, nk + 8))  # may exceed the active count
    ord_ = int(r.choice([-1, 0, 1, 2]))
    query_chunk = int(r.choice([8, 32]))
    local_streaming = bool(r.integers(0, 2))  # per-shard scan vs dense

    key_emb = r.normal(size=(nk, d)).astype(np.float32)
    key_expr = r.normal(size=(nk, g)).astype(np.float32)
    query = r.normal(size=(nq, d)).astype(np.float32)
    mask = None
    if r.integers(0, 2):
        mask = r.random(nk) > 0.4
        if not mask.any():
            mask[int(r.integers(0, nk))] = True

    ref_emb, ref_expr = retrieval.retrieve_and_aggregate(
        key_emb, key_expr, query, top_k=top_k, weight_ord=ord_, key_mask=mask)
    k_eff = min(top_k, nk if mask is None else int(mask.sum()))
    _, ref_idx = retrieval.find_matches(
        jnp.asarray(key_emb), jnp.asarray(query), k_eff,
        key_mask=None if mask is None else jnp.asarray(mask))

    vals, idx, emb, expr = sharded_retrieve_and_aggregate(
        key_emb, key_expr, query, top_k=top_k, mesh=mesh, weight_ord=ord_,
        key_mask=mask, query_chunk=query_chunk, return_matches=True,
        local_streaming=local_streaming)
    ctx = (f"trial={trial} nk={nk} nq={nq} d={d} g={g} k={top_k} ord={ord_} "
           f"qchunk={query_chunk} masked={mask is not None} "
           f"local_streaming={local_streaming}")
    np.testing.assert_array_equal(idx, np.asarray(ref_idx), err_msg=ctx)
    np.testing.assert_allclose(emb, ref_emb, rtol=2e-5, atol=2e-5, err_msg=ctx)
    np.testing.assert_allclose(expr, ref_expr, rtol=2e-5, atol=2e-5, err_msg=ctx)


def test_sharded_local_streaming_matches_dense(rng, mesh):
    # Forced per-shard streaming scan (the composition for shards past the
    # dense score budget): identical selection + aggregation, incl. a mask.
    nk, nq, d, g, k = 200, 13, 16, 8, 11
    key_emb = rng.normal(size=(nk, d)).astype(np.float32)
    key_expr = rng.normal(size=(nk, g)).astype(np.float32)
    query = rng.normal(size=(nq, d)).astype(np.float32)
    mask = np.ones(nk, bool)
    mask[25:90] = False
    ref_emb, ref_expr = retrieval.retrieve_and_aggregate(
        key_emb, key_expr, query, top_k=k, weight_ord=2, key_mask=mask)
    _, ref_idx = retrieval.find_matches(
        jnp.asarray(key_emb), jnp.asarray(query), k,
        key_mask=jnp.asarray(mask))
    _, idx, emb, expr = sharded_retrieve_and_aggregate(
        key_emb, key_expr, query, top_k=k, mesh=mesh, weight_ord=2,
        key_mask=mask, return_matches=True, local_streaming=True)
    np.testing.assert_array_equal(idx, np.asarray(ref_idx))
    np.testing.assert_allclose(emb, ref_emb, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(expr, ref_expr, rtol=2e-5, atol=1e-6)


def test_sharded_device_resident_inputs(rng, mesh):
    # The resident-database pattern: keys pre-placed on the mesh as device
    # arrays (divisible case re-lays-out in place; the non-divisible case
    # pays one on-device pad) — results identical to host inputs.
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    for nk in (96, 101):  # device multiple and not
        key_emb = rng.normal(size=(nk, 8)).astype(np.float32)
        key_expr = rng.normal(size=(nk, 6)).astype(np.float32)
        query = rng.normal(size=(9, 8)).astype(np.float32)
        ref_emb, ref_expr = sharded_retrieve_and_aggregate(
            key_emb, key_expr, query, top_k=5, mesh=mesh, weight_ord=1)
        if nk % 8 == 0:
            sharding = NamedSharding(mesh, P("data"))
            k_dev = jax.device_put(key_emb, sharding)
            e_dev = jax.device_put(key_expr, sharding)
        else:  # replicated device arrays exercise the on-device pad branch
            k_dev = jax.device_put(key_emb, NamedSharding(mesh, P()))
            e_dev = jax.device_put(key_expr, NamedSharding(mesh, P()))
        emb, expr = sharded_retrieve_and_aggregate(
            k_dev, e_dev, query, top_k=5, mesh=mesh, weight_ord=1)
        np.testing.assert_allclose(emb, ref_emb, rtol=1e-6)
        np.testing.assert_allclose(expr, ref_expr, rtol=1e-6)


def test_sharded_multi_chunk_queries(rng, mesh):
    # query_chunk smaller than Nq: padded tail chunks slice off cleanly
    nk, nq, d, g, k = 96, 37, 8, 6, 5
    key_emb = rng.normal(size=(nk, d)).astype(np.float32)
    key_expr = rng.normal(size=(nk, g)).astype(np.float32)
    query = rng.normal(size=(nq, d)).astype(np.float32)
    ref_emb, ref_expr = retrieval.retrieve_and_aggregate(
        key_emb, key_expr, query, top_k=k, weight_ord=1)
    emb, expr = sharded_retrieve_and_aggregate(
        key_emb, key_expr, query, top_k=k, mesh=mesh, weight_ord=1,
        query_chunk=16)
    np.testing.assert_allclose(emb, ref_emb, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(expr, ref_expr, rtol=2e-5, atol=1e-6)
