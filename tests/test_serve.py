"""Serving path: HBM-resident database + bucket-padded encode + HTTP API.

The serving encoder must agree with the eval-path embedding sweep (same
checkpoint => same embeddings), bucket padding must not leak into results
(eval-mode BN makes zero-padding exact), and the HTTP layer must round-trip
both payload encodings and fail loudly on malformed requests.
"""

import base64
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from mclstexp_tpu.config import Config, DataConfig, EvalConfig, ModelConfig, TrainConfig
from mclstexp_tpu.data import synthetic
from mclstexp_tpu.infer import embed
from mclstexp_tpu.infer.serve import (
    PredictionService,
    _bucket_size,
    make_server,
)
from mclstexp_tpu.ops.retrieval import retrieve_and_aggregate
from mclstexp_tpu.train.state import create_train_state


@pytest.fixture(scope="module")
def setup():
    cfg = Config(
        model=ModelConfig(
            encoder_name="tiny_cnn", image_dim=128, spot_dim=24,
            projection_dim=16, heads_num=2, heads_dim=8, head_layers=1,
        ),
        train=TrainConfig(batch_size=32, seed=0),
        eval=EvalConfig(batch_size=16, top_k=8, weight_ord=1),
        data=DataConfig(dataset="synthetic", patch_size=16),
    )
    sections = synthetic.make_dataset(
        num_sections=3, num_spots=48, num_genes=24, patch_size=16, seed=7
    )
    sample = {
        "image": sections[0].patches[:1].astype(np.float32) / 255.0,
        "expression": sections[0].expression[:1],
        "position": sections[0].positions[:1],
    }
    model, state = create_train_state(cfg.model, cfg.train, sample)
    service = PredictionService.from_sections(
        model, state.params, state.batch_stats, sections,
        batch_size=cfg.eval.batch_size, top_k=cfg.eval.top_k,
        weight_ord=cfg.eval.weight_ord, max_batch=32,
    )
    return cfg, sections, model, state, service


def test_database_matches_eval_sweep(setup):
    cfg, sections, model, state, service = setup
    assert service.num_keys == sum(s.num_spots for s in sections)
    assert service.num_genes == sections[0].num_genes
    _, spot = embed.compute_embeddings(
        model, state.params, state.batch_stats, sections, cfg.eval.batch_size
    )
    np.testing.assert_allclose(np.asarray(service.key_emb), spot, atol=1e-6)


def test_embed_patches_matches_eval_sweep(setup):
    """The serving encoder and the eval-path image sweep are the same model
    program modulo batching; embeddings must agree."""
    cfg, sections, model, state, service = setup
    patches = sections[0].patches[:20]
    got = service.embed_patches(patches)
    img, _ = embed.compute_embeddings(
        model, state.params, state.batch_stats, [sections[0]],
        cfg.eval.batch_size,
    )
    np.testing.assert_allclose(got, img[:20], atol=1e-5)


def test_bucket_padding_is_exact(setup):
    """B=3 pads to the 4-bucket; results must equal the unpadded rows."""
    _, sections, _, _, service = setup
    patches = sections[1].patches[:4]
    e4 = service.embed_patches(patches)          # exact bucket, no padding
    e3 = service.embed_patches(patches[:3])      # padded to 4
    np.testing.assert_array_equal(e3, e4[:3])
    # chunking: B > max_batch splits and re-concatenates in order
    big = sections[1].patches[:40]               # max_batch=32 -> 32 + 8
    eb = service.embed_patches(big)
    np.testing.assert_allclose(eb[:4], e4, atol=1e-6)
    assert eb.shape[0] == 40


def test_bucket_size():
    assert _bucket_size(1, 256) == 1
    assert _bucket_size(3, 256) == 4
    assert _bucket_size(4, 256) == 4
    assert _bucket_size(33, 256) == 64
    assert _bucket_size(300, 256) == 256
    # --max-batch is a hard HBM/compile bound: the cap wins even when it is
    # not a power of two (150 would otherwise round up past it to 256)
    assert _bucket_size(150, 200) == 200
    assert _bucket_size(201, 200) == 200


def test_exclude_section_masks_after_joint_embedding(setup):
    """from_sections(exclude_section=i) must keep the FULL concatenation's
    embeddings (batch-as-sequence boundaries unchanged) and merely mask
    section i's rows out of retrieval — the LOO protocol's key-mask
    semantics (infer/evaluate.py), not a smaller database."""
    cfg, sections, model, state, service = setup
    loo = PredictionService.from_sections(
        model, state.params, state.batch_stats, sections,
        batch_size=cfg.eval.batch_size, exclude_section=1,
        top_k=cfg.eval.top_k, weight_ord=cfg.eval.weight_ord, max_batch=32,
    )
    # embeddings identical to the unmasked service: no boundary shift
    np.testing.assert_array_equal(
        np.asarray(loo.key_emb), np.asarray(service.key_emb))
    sizes = [s.num_spots for s in sections]
    mask = np.asarray(loo.key_mask)
    assert mask.shape == (sum(sizes),)
    start = sizes[0]
    assert not mask[start:start + sizes[1]].any()
    assert mask[:start].all() and mask[start + sizes[1]:].all()
    assert loo.info()["num_active_keys"] == sum(sizes) - sizes[1]

    # predictions equal explicit masked retrieval over the same database
    patches = sections[1].patches[:5]
    pred = loo.predict(patches)
    q = loo.embed_patches(patches)
    _, want = retrieve_and_aggregate(
        loo.key_emb, loo.key_expr, q, top_k=loo.top_k,
        weight_ord=loo.weight_ord, key_mask=loo.key_mask,
    )
    np.testing.assert_allclose(pred, want, atol=1e-6)
    with pytest.raises(ValueError, match="out of range"):
        PredictionService.from_sections(
            model, state.params, state.batch_stats, sections,
            batch_size=cfg.eval.batch_size, exclude_section=3,
        )


def test_patch_size_validation(setup):
    """A pinned patch size rejects off-size patches (each novel H/W would
    otherwise compile a fresh XLA program and embed out-of-distribution)."""
    cfg, sections, model, state, service = setup
    pinned = PredictionService(
        model, state.params, state.batch_stats,
        np.asarray(service.key_emb), np.asarray(service.key_expr),
        top_k=cfg.eval.top_k, weight_ord=cfg.eval.weight_ord,
        patch_size=16,
    )
    ok = pinned.embed_patches(sections[0].patches[:2])
    assert ok.shape[0] == 2
    with pytest.raises(ValueError, match="training patch size"):
        pinned.embed_patches(np.zeros((2, 32, 32, 3), np.uint8))
    with pytest.raises(ValueError, match="training patch size"):
        pinned.embed_patches(np.zeros((2, 16, 8, 3), np.uint8))


def test_predict_is_retrieval_over_database(setup):
    _, sections, _, _, service = setup
    patches = sections[2].patches[:6]
    pred = service.predict(patches)
    assert pred.shape == (6, service.num_genes)
    q = service.embed_patches(patches)
    _, want = retrieve_and_aggregate(
        service.key_emb, service.key_expr, q,
        top_k=service.top_k, weight_ord=service.weight_ord,
    )
    np.testing.assert_allclose(pred, want, atol=1e-6)


def test_validation(setup):
    _, sections, model, state, service = setup
    with pytest.raises(ValueError, match="uint8"):
        service.embed_patches(sections[0].patches[:2].astype(np.float32))
    with pytest.raises(ValueError, match="NHWC"):
        service.embed_patches(sections[0].patches[0])
    with pytest.raises(ValueError, match="database size"):
        PredictionService(
            model, state.params, state.batch_stats,
            np.zeros((4, 16), np.float32), np.zeros((5, 24), np.float32),
        )
    # top_k clamps to the database size
    small = PredictionService(
        model, state.params, state.batch_stats,
        np.asarray(service.key_emb)[:5], np.asarray(service.key_expr)[:5],
        top_k=200,
    )
    assert small.top_k == 5


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def test_http_roundtrip(setup):
    _, sections, _, _, service = setup
    server = make_server(service, port=0)
    host, port = server.server_address[:2]
    base = f"http://{host}:{port}"
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"{base}/healthz") as r:
            info = json.loads(r.read())
        assert info["status"] == "ok"
        assert info["num_keys"] == service.num_keys

        patches = sections[0].patches[:3]
        want = service.predict(patches)

        # base64 fast path, base64 response
        out = _post(f"{base}/predict", {
            "patches_b64": base64.b64encode(patches.tobytes()).decode(),
            "shape": list(patches.shape), "b64": True,
        })
        got = np.frombuffer(
            base64.b64decode(out["result_b64"]), np.float32
        ).reshape(out["shape"])
        np.testing.assert_array_equal(got, want)

        # nested-list path, JSON response
        out = _post(f"{base}/predict", {"patches": patches.tolist()})
        np.testing.assert_allclose(
            np.asarray(out["result"], np.float32), want, atol=1e-6
        )

        # /embed returns the query embeddings
        out = _post(f"{base}/embed", {"patches": patches.tolist()})
        np.testing.assert_allclose(
            np.asarray(out["result"], np.float32),
            service.embed_patches(patches), atol=1e-6,
        )

        # malformed requests -> 400 with an error body
        for bad in (
            {},  # no patches at all
            {"patches_b64": "AAAA", "shape": [1, 16, 16, 3]},  # byte count
            {"patches_b64": base64.b64encode(patches.tobytes()).decode()},
        ):
            with pytest.raises(urllib.error.HTTPError) as exc:
                _post(f"{base}/predict", bad)
            assert exc.value.code == 400
            assert "error" in json.loads(exc.value.read())

        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(f"{base}/nope", {})
        assert exc.value.code == 404
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(f"{base}/nope")
        assert exc.value.code == 404

        # an unexpected server-side failure yields HTTP 500 with an error
        # body, not a dropped connection from a dead handler thread
        orig = service.predict
        service.predict = lambda p: (_ for _ in ()).throw(
            RuntimeError("XLA shape boom"))
        try:
            with pytest.raises(urllib.error.HTTPError) as exc:
                _post(f"{base}/predict", {"patches": patches.tolist()})
            assert exc.value.code == 500
            assert "XLA shape boom" in json.loads(exc.value.read())["error"]
        finally:
            service.predict = orig
    finally:
        server.shutdown()
        server.server_close()
        t.join(timeout=5)
