"""Tests pinning the reference's behavioral quirks (SURVEY §7 quirk policy).

These exist so a refactor can't silently "fix" behavior that the published
protocol depends on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mclstexp_tpu.config import ModelConfig
from mclstexp_tpu.models.mclstexp import MclSTExp

TINY = ModelConfig(
    encoder_name="tiny_cnn", image_dim=128, spot_dim=16, projection_dim=8,
    heads_num=2, heads_dim=4, head_layers=1, pos_vocab=64,
)


def _batch(rng, n=8):
    return {
        "image": jnp.asarray(rng.uniform(size=(n, 16, 16, 3)).astype(np.float32)),
        "expression": jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32)),
        "position": jnp.asarray(rng.integers(0, 64, size=(n, 2)).astype(np.int32)),
    }


def test_spot_embeddings_depend_on_batch_composition(rng):
    """The batch-as-sequence quirk (reference model.py:236): a spot's
    embedding CHANGES when its batchmates change — eval batching is
    therefore part of the model's semantics."""
    model = MclSTExp(TINY)
    batch = _batch(rng, 8)
    variables = model.init(jax.random.PRNGKey(0), batch)

    full = model.apply(
        variables, batch["expression"], batch["position"], method=MclSTExp.encode_spots
    )
    half = model.apply(
        variables, batch["expression"][:4], batch["position"][:4],
        method=MclSTExp.encode_spots,
    )
    # same spots, different batchmates -> different embeddings
    assert not np.allclose(np.asarray(full[:4]), np.asarray(half), atol=1e-5)


def test_image_embeddings_independent_of_batch(rng):
    """The image tower has no cross-batch mixing at eval (BN in inference
    mode) — this is what allows the large-batch image tower at eval."""
    model = MclSTExp(TINY)
    batch = _batch(rng, 8)
    variables = model.init(jax.random.PRNGKey(0), batch)
    full = model.apply(variables, batch["image"], method=MclSTExp.encode_image)
    half = model.apply(variables, batch["image"][:4], method=MclSTExp.encode_image)
    np.testing.assert_allclose(np.asarray(full[:4]), np.asarray(half), atol=1e-5)


def test_infonce_uses_unnormalized_embeddings(rng):
    """The reference calls the logit matrix 'cos_smi' but never normalizes
    (model.py:242); scaling one tower must change the loss."""
    from mclstexp_tpu.core.losses import symmetric_infonce

    spot = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
    img = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
    a = float(symmetric_infonce(spot, img, 1.0))
    b = float(symmetric_infonce(spot * 3.0, img, 1.0))
    assert abs(a - b) > 1e-4


def test_retrieval_distances_on_unnormalized_embeddings(rng):
    """find_matches normalizes internally, but the 1/d^2 weights use the
    raw embeddings (evel_her2st.py:178 operates on the originals)."""
    from mclstexp_tpu.ops.retrieval import retrieve_and_aggregate

    key = rng.normal(size=(50, 8)).astype(np.float32)
    expr = rng.normal(size=(50, 5)).astype(np.float32)
    query = rng.normal(size=(4, 8)).astype(np.float32)
    _, p1 = retrieve_and_aggregate(key, expr, query, top_k=5, weight_ord=2)
    # scaling keys changes distances (hence weights) even though the
    # retrieved indices are scale-invariant
    _, p2 = retrieve_and_aggregate(key * 2.0, expr, query, top_k=5, weight_ord=2)
    assert not np.allclose(p1, p2, atol=1e-7)


def test_eval_batches_cross_section_boundaries():
    """ConcatDataset semantics (evel_her2st.py:15-27): batch boundaries do
    not align to sections, so one eval batch can span two sections."""
    from mclstexp_tpu.data import synthetic
    from mclstexp_tpu.data.pipeline import ConcatSections, eval_batches

    sections = synthetic.make_dataset(num_sections=2, num_spots=20, num_genes=4)
    data = ConcatSections.from_sections(sections)
    batches = list(eval_batches(data, 16))
    # batch 1 = spots 16..31: 4 from section 0, 12 from section 1
    np.testing.assert_array_equal(
        batches[1]["expression"][:4], sections[0].expression[16:]
    )
    np.testing.assert_array_equal(
        batches[1]["expression"][4:], sections[1].expression[:12]
    )


def test_her2st_fold_convention():
    """Held-out section = sorted names[1:33][fold] (dataset.py:161-167)."""
    from mclstexp_tpu.data.pipeline import split_fold
    from mclstexp_tpu.data import synthetic

    sections = synthetic.make_dataset(num_sections=4, num_spots=4, num_genes=4)
    for fold in range(4):
        _, test = split_fold(sections, fold)
        assert test.name == sections[fold].name


def test_visium_raw_scale_quirk(rng):
    """TenxDataset feeds patches as RAW 0-255 floats (reference
    dataset.py:336: torch.tensor(image).permute(2,0,1).float(), no /255).
    The visium preset must default the parity flag on, and the raw-scale
    output must be exactly 255x the [0,1]-scaled one (same flips/rotations
    under the same key)."""
    from mclstexp_tpu.config import get_config
    from mclstexp_tpu.ops.augment import tenx_augment

    assert get_config("visium").data.visium_raw_scale is True
    assert get_config("her2st").data.visium_raw_scale is False

    u8 = jnp.asarray(rng.integers(0, 256, size=(4, 16, 16, 3)), jnp.uint8)
    key = jax.random.PRNGKey(0)
    raw = tenx_augment(key, u8, raw_scale=True)
    scaled = tenx_augment(key, u8, raw_scale=False)
    assert float(raw.max()) > 1.5  # genuinely unscaled
    np.testing.assert_allclose(np.asarray(raw), np.asarray(scaled) * 255.0, rtol=1e-6)


def test_train_step_visium_raw_scale(rng):
    """The tenx train step consumes raw-scale images when the flag is set
    (different loss than the [0,1] path on the same batch/rng)."""
    from mclstexp_tpu.train.state import create_train_state
    from mclstexp_tpu.train.step import make_train_step
    from mclstexp_tpu.config import TrainConfig

    batch = {
        "image_u8": jnp.asarray(rng.integers(0, 256, size=(8, 16, 16, 3)), jnp.uint8),
        "expression": jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32)),
        "position": jnp.asarray(rng.integers(0, 64, size=(8, 2)).astype(np.int32)),
    }
    sample = {
        "image": np.asarray(batch["image_u8"][:1], np.float32) / 255.0,
        "expression": np.asarray(batch["expression"][:1]),
        "position": np.asarray(batch["position"][:1]),
    }
    model, state = create_train_state(TINY, TrainConfig(batch_size=8), sample)
    rng_step = jax.random.PRNGKey(1)
    _, loss_raw = make_train_step(model, augment_mode="tenx", donate=False,
                                  tenx_raw_scale=True)(state, batch, rng_step)
    _, loss_unit = make_train_step(model, augment_mode="tenx", donate=False,
                                   tenx_raw_scale=False)(state, batch, rng_step)
    assert float(loss_raw) != float(loss_unit)


def test_topk_tie_break_quirk(rng):
    """Exact-duplicate key embeddings (tied cosine scores) straddling the
    top-K cut: a DOCUMENTED DIVERGENCE from the reference.

    The reference selects via torch.topk (evel_her2st.py:82), whose choice
    among exactly tied scores is UNSPECIFIED — probed on torch 2.x CPU it
    returns an arbitrary subset in arbitrary order (topk(ones(10), 4) ->
    {5,6,7,8}), an artifact of its partition-based kernel, not protocol
    intent. Our lax.top_k is deterministic: lowest index first. On every
    reference protocol run scores are continuous (float cosine of learned
    embeddings — ties occur only for bit-identical spot embeddings), so the
    reachable flow is unaffected; with ties, the reference's own output is
    implementation-arbitrary and we pin the deterministic choice instead
    (quirk policy: don't reproduce behavior the reference itself doesn't
    define). The A/B counterpart (test_reference_eval_ab.py: tie-break
    case) shows the four protocol averages still match the reference's
    script on tie-heavy data whenever tied keys carry equal expression —
    i.e. whenever the protocol's OUTPUT is actually well-defined."""
    from mclstexp_tpu.ops import retrieval

    nk_tail, n_tied, d, g, k = 30, 12, 8, 5, 8
    v = rng.normal(size=d).astype(np.float32)
    key_emb = np.concatenate([
        np.tile(v, (n_tied, 1)),                      # ranks 1..12 (tied)
        rng.normal(size=(nk_tail, d)).astype(np.float32) * 0.05,
    ])
    # every query aligned with v: the 12-way tie straddles the K=8 cut
    query = (np.tile(v, (3, 1))
             + 0.01 * rng.normal(size=(3, d)).astype(np.float32))

    # 1) OUR tie-break is deterministic lowest-index (lax.top_k contract)
    _, idx = retrieval.find_matches(jnp.asarray(key_emb), jnp.asarray(query),
                                    top_k=k)
    np.testing.assert_array_equal(np.asarray(idx),
                                  np.tile(np.arange(k), (3, 1)))
    _, idx_s = retrieval.streaming_topk(jnp.asarray(key_emb),
                                        jnp.asarray(query), k, chunk_size=7)
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx))

    # 2) when tied keys carry one expression, the prediction is invariant
    # to ANY k-subset of the tie group — the only regime where the
    # reference protocol's output is well-defined; both paths return it
    x = rng.normal(size=g).astype(np.float32)
    key_expr = np.concatenate([
        np.tile(x, (n_tied, 1)),
        rng.normal(size=(nk_tail, g)).astype(np.float32),
    ])
    for streaming in (False, True):
        _, pred = retrieval.retrieve_and_aggregate(
            key_emb, key_expr, query, top_k=k, weight_ord=1,
            streaming=streaming)
        np.testing.assert_allclose(pred, np.tile(x, (3, 1)), rtol=1e-5)
