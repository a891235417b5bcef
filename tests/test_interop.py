"""Reference-artifact interoperability tests.

The reference splits evaluation into phase A (embedding dumps,
``evel_her2st.py:87-117``) and phase B (retrieval metrics from dumps,
``evel_her2st.py:143-226``). These tests prove the rebuild can consume the
reference's artifacts directly:

  * ``eval --from-embeddings`` scores a directory of reference-layout
    embedding dumps without a model or checkpoint;
  * ``eval --torch-checkpoint`` scores a reference-format torch ``.pt``
    (key shims + tensor conversion) without retraining.
"""

import json
import os

import numpy as np
import pytest

from mclstexp_tpu.cli.main import main
from mclstexp_tpu.infer import evaluate


def _write_reference_dumps(root, spot_embs, img_embs, folds):
    """Write per-fold dumps in the reference layout: transposed (P, N_i)
    per-section spot/img arrays (evel_her2st.py:109-117)."""
    for fold in folds:
        d = os.path.join(root, f"embeddings_{fold}")
        os.makedirs(d, exist_ok=True)
        for i, (sp, im) in enumerate(zip(spot_embs, img_embs)):
            np.save(os.path.join(d, f"spot_embeddings_{i + 1}.npy"), sp.T)
            np.save(os.path.join(d, f"img_embeddings_{i + 1}.npy"), im.T)


def test_load_reference_embeddings_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    spots = [rng.normal(size=(n, 8)).astype(np.float32) for n in (10, 12, 9)]
    imgs = [s + 0.1 for s in spots]
    _write_reference_dumps(tmp_path, spots, imgs, folds=[1])
    img_q, sp = evaluate.load_reference_embeddings(
        str(tmp_path / "embeddings_1"), 3, fold=1
    )
    np.testing.assert_allclose(img_q, imgs[1])
    for a, b in zip(sp, spots):
        np.testing.assert_allclose(a, b)


def test_evaluate_from_embedding_dumps(tmp_path):
    """Phase-B scoring from dumps alone recovers good metrics when the image
    embeddings encode expression."""
    rng = np.random.default_rng(1)
    n_genes, proj = 16, 8
    w = rng.normal(size=(n_genes, proj)).astype(np.float32)
    exprs = [np.abs(rng.normal(size=(20, n_genes))).astype(np.float32) for _ in range(3)]
    spots = [e @ w for e in exprs]
    imgs = [s + 0.01 * rng.normal(size=s.shape).astype(np.float32) for s in spots]
    _write_reference_dumps(tmp_path, spots, imgs, folds=range(3))

    out = evaluate.evaluate_from_embedding_dumps(
        str(tmp_path), exprs, top_k=4, weight_ord=1
    )
    assert out["folds"] == [0, 1, 2]
    assert np.isfinite(out["avg"]["mse"])
    assert out["avg"]["hvg_pcc"] > 0.3

    # single-fold subset
    one = evaluate.evaluate_from_embedding_dumps(
        str(tmp_path), exprs, top_k=4, weight_ord=1, folds=[2]
    )
    assert one["folds"] == [2]
    assert one["per_fold"][0] == out["per_fold"][2]


def test_eval_from_embeddings_cli(tmp_path):
    """hvg -> synthetic dumps -> `eval --from-embeddings` prints the four
    averages end to end with no model or checkpoint."""
    pre = tmp_path / "pre"
    rc = main(["hvg", "--dataset", "synthetic", "--out", str(pre),
               "--patch-cache", str(tmp_path / "patch_cache")])
    assert rc == 0
    names = sorted(os.listdir(pre / "synthetic"))
    exprs = [
        np.load(pre / "synthetic" / nm / "preprocessed_matrix.npy").T.astype(np.float32)
        for nm in names
    ]

    rng = np.random.default_rng(2)
    w = rng.normal(size=(exprs[0].shape[1], 8)).astype(np.float32)
    spots = [e @ w for e in exprs]
    imgs = [s + 0.01 * rng.normal(size=s.shape).astype(np.float32) for s in spots]
    dumps = tmp_path / "dumps"
    _write_reference_dumps(str(dumps), spots, imgs, folds=range(len(exprs)))

    out_json = tmp_path / "results.json"
    rc = main(["eval", "--dataset", "synthetic",
               "--from-embeddings", str(dumps),
               "--preprocessed-root", str(pre),
               "--patch-cache", str(tmp_path / "patch_cache"),
               "--json", str(out_json)])
    assert rc == 0
    results = json.loads(out_json.read_text())
    for k in ("heg_pcc", "hvg_pcc", "mse", "mae"):
        assert np.isfinite(results["avg"][k])
    assert results["avg"]["hvg_pcc"] > 0.3


@pytest.mark.slow
def test_eval_torch_checkpoint_cli(tmp_path):
    """A reference-format full-model .pt (densenet tower + spot side) is
    scored by the CLI without retraining (evel_her2st.py:32-39 load path)."""
    torch = pytest.importorskip("torch")
    from test_torch_import import _make_densenet_sd, _make_reference_sd

    spot_dim, proj, heads, dim_head, layers = 32, 32, 2, 8, 1
    sd = {k: torch.tensor(v) for k, v in _make_densenet_sd(np.random.default_rng(0)).items()}
    extra = _make_reference_sd(
        np.random.default_rng(1), spot_dim, proj, heads, dim_head, layers,
        vocab=65536,
    )
    # reference image_projection input dim is 1024 for densenet (train.py:18)
    rng2 = np.random.default_rng(2)
    for k in list(extra):
        if k.startswith("image_projection"):
            del extra[k]
    extra["image_projection.projection.weight"] = torch.tensor(
        rng2.normal(size=(proj, 1024)).astype(np.float32) * 0.02)
    extra["image_projection.projection.bias"] = torch.zeros(proj)
    extra["image_projection.fc.weight"] = torch.tensor(
        rng2.normal(size=(proj, proj)).astype(np.float32) * 0.1)
    extra["image_projection.fc.bias"] = torch.zeros(proj)
    extra["image_projection.layer_norm.weight"] = torch.ones(proj)
    extra["image_projection.layer_norm.bias"] = torch.zeros(proj)
    sd.update(extra)
    pt = tmp_path / "best_0.pt"
    torch.save(sd, pt)

    out_json = tmp_path / "results.json"
    rc = main(["eval", "--dataset", "synthetic", "--fold", "0",
               "--encoder_name", "densenet121",
               "--projection_dim", str(proj), "--heads_num", str(heads),
               "--heads_dim", str(dim_head), "--heads_layers", str(layers),
               "--torch-checkpoint", str(tmp_path / "best_{fold}.pt"),
               "--patch-cache", str(tmp_path / "patch_cache"),
               "--checkpoint-dir", str(tmp_path / "model_result"),
               "--json", str(out_json)])
    assert rc == 0
    results = json.loads(out_json.read_text())
    for k in ("heg_pcc", "hvg_pcc", "mse", "mae"):
        assert np.isfinite(results["avg"][k])
