"""Reverse interop: flax checkpoint -> reference torch state_dict.

``test_reference_ab.py`` proves reference->here (import shared weights, same
loss); these tests prove here->reference: a randomly initialized model from
THIS framework exports through ``export_reference_state_dict`` into a dict
the reference's own ``mclSTExp_Attention`` / ``mclSTExp_MLP``
(``/root/reference/model.py:201-247, 171-198``) accept with
``load_state_dict(strict=True)``, and the two implementations then compute
the same forward loss. Every export also re-imports itself
(``verify=True``) so a silently lossy layout inversion cannot ship.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import jax
import numpy as np
import pytest
import torch

from mclstexp_tpu.config import ModelConfig
from mclstexp_tpu.core.losses import symmetric_infonce
from mclstexp_tpu.models.image.torch_export import (
    export_reference_state_dict,
    save_reference_checkpoint,
)
from mclstexp_tpu.models.mclstexp import MclSTExp

REFERENCE_MODEL = "/root/reference/model.py"


@pytest.fixture(scope="module")
def refmod():
    if not os.path.exists(REFERENCE_MODEL):
        pytest.skip("reference checkout not mounted")
    import _torchvision_stub

    _torchvision_stub.install()
    spec = importlib.util.spec_from_file_location("reference_model_exp", REFERENCE_MODEL)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["reference_model_exp"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def patched(refmod, monkeypatch):
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    torch.manual_seed(0)
    return refmod


_ATTN_CFG = ModelConfig(
    encoder_name="densenet121", image_dim=1024, spot_dim=16, projection_dim=32,
    heads_num=4, heads_dim=8, head_layers=2,
)


def _init_ours(cfg: ModelConfig, n=4, patch=64, seed=0):
    model = MclSTExp(cfg)
    rng = np.random.default_rng(seed)
    batch = {
        "image": rng.uniform(size=(n, patch, patch, 3)).astype(np.float32),
        "expression": rng.normal(size=(n, cfg.spot_dim)).astype(np.float32),
        "position": rng.integers(0, 64, size=(n, 2)).astype(np.int32),
    }
    variables = model.init(jax.random.PRNGKey(seed), batch, train=False)
    return model, variables["params"], variables.get("batch_stats", {})


def _torch_sd(sd):
    return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}


def _eval_batch(rng, n, g, patch):
    u8 = rng.integers(0, 256, size=(n, patch, patch, 3), dtype=np.uint8)
    expr = rng.normal(size=(n, g)).astype(np.float32)
    pos = rng.integers(0, 65536, size=(n, 2)).astype(np.int64)
    tb = {
        "image": torch.tensor(u8.astype(np.float32) / 255.0).permute(0, 3, 1, 2),
        "expression": torch.tensor(expr),
        "position": torch.tensor(pos),
    }
    jb = {
        "image": u8.astype(np.float32) / 255.0,
        "expression": expr,
        "position": pos.astype(np.int32),
    }
    return tb, jb


@pytest.mark.slow
def test_reference_strict_loads_export_attention(patched, tmp_path):
    """Our random init -> export -> strict torch load -> same eval loss;
    plus a .pt file roundtrip through the reference's on-disk format."""
    model, params, batch_stats = _init_ours(_ATTN_CFG)
    # verify=True re-imports and bit-compares inside the call
    sd = export_reference_state_dict(params, batch_stats, _ATTN_CFG)

    ref = patched.mclSTExp_Attention(
        encoder_name="densenet121", temperature=1.0, image_dim=1024,
        spot_dim=16, projection_dim=32, heads_num=4, heads_dim=8, head_layers=2,
    )
    # strict=True: every reference tensor present, nothing unexpected
    ref.load_state_dict(_torch_sd(sd), strict=True)

    tb, jb = _eval_batch(np.random.default_rng(1), 5, 16, 64)
    ref.eval()
    with torch.no_grad():
        ref_loss = float(ref(tb))
    ie, se = model.apply({"params": params, "batch_stats": batch_stats}, jb)
    ours = float(symmetric_infonce(se, ie, 1.0))
    np.testing.assert_allclose(ours, ref_loss, rtol=1e-5, atol=1e-6)

    # the .pt format the reference's eval scripts torch.load
    path = str(tmp_path / "best_0.pt")
    save_reference_checkpoint(path, params, batch_stats, _ATTN_CFG)
    from mclstexp_tpu.train.checkpoint import load_torch_state_dict

    reread = load_torch_state_dict(path)
    assert set(reread) == set(sd)
    np.testing.assert_array_equal(
        reread["image_projection.projection.weight"],
        sd["image_projection.projection.weight"],
    )
    assert sd["spot_encoder.0.attn.norm.weight"].shape == (16,)
    assert sd["image_encoder.model.0.norm0.num_batches_tracked"].dtype == np.int64


def test_reference_strict_loads_export_mlp(patched):
    """The mlp ablation exports under the reference's ``image_ecode``
    attribute typo (model.py:176) so strict load works verbatim."""
    cfg = ModelConfig(
        encoder_name="densenet121", image_dim=1024, spot_dim=16,
        projection_dim=32, variant="mlp",
    )
    model, params, batch_stats = _init_ours(cfg)
    sd = export_reference_state_dict(params, batch_stats, cfg)
    assert any(k.startswith("image_ecode.") for k in sd)
    assert not any(k.startswith("image_encoder.") for k in sd)

    ref = patched.mclSTExp_MLP(
        temperature=1.0, image_embedding=1024, spot_embedding=16, projection_dim=32
    )
    ref.load_state_dict(_torch_sd(sd), strict=True)

    tb, jb = _eval_batch(np.random.default_rng(2), 5, 16, 64)
    ref.eval()
    with torch.no_grad():
        ref_loss = float(ref(tb))
    ie, se = model.apply({"params": params, "batch_stats": batch_stats}, jb)
    ours = float(symmetric_infonce(se, ie, 1.0))
    np.testing.assert_allclose(ours, ref_loss, rtol=1e-5, atol=1e-6)


def test_pos_prefix_pads_to_reference_rows():
    """ST presets train on a sliced pos-table prefix (PROFILE_r03.md); export
    pads back to the reference's 65536-row nn.Embedding with zeros beyond
    the prefix, and the verify re-import slices it back bit-exactly.
    Also covers the resnet (basic-block) export path."""
    cfg = ModelConfig(
        encoder_name="res18", image_dim=512, spot_dim=16, projection_dim=32,
        heads_num=4, heads_dim=8, head_layers=2, pos_vocab=128,
    )
    _, params, batch_stats = _init_ours(cfg)
    sd = export_reference_state_dict(params, batch_stats, cfg)

    table = np.asarray(params["spot_encoder"]["pos"]["x_embed"])
    assert table.shape == (128, 16)
    assert sd["x_embed.weight"].shape == (65536, 16)
    np.testing.assert_array_equal(sd["x_embed.weight"][:128], table)
    assert not sd["x_embed.weight"][128:].any()
    # resnet trunk under the reference's Sequential(children[:-1]) numbering
    assert "image_encoder.model.0.weight" in sd  # conv1
    assert "image_encoder.model.4.0.conv1.weight" in sd  # layer1 block0


def test_vit_export_roundtrip():
    """The timm-naming ViT export path: inferred depth, patch_embed bias,
    final norm — proven lossless by the verify re-import."""
    cfg = ModelConfig(
        encoder_name="vit", image_dim=768, spot_dim=16, projection_dim=32,
        heads_num=4, heads_dim=8, head_layers=2, pos_vocab=128,
    )
    _, params, batch_stats = _init_ours(cfg, n=2, patch=224)
    sd = export_reference_state_dict(params, batch_stats, cfg)
    depth = sum(1 for k in params["image_encoder"] if k.startswith("block"))
    assert f"image_encoder.model.blocks.{depth - 1}.mlp.fc2.weight" in sd
    assert "image_encoder.model.cls_token" in sd
    # the reference's timm tower (global_pool="avg", model.py:104-116)
    # stores the post-pool LayerNorm as fc_norm.*; "norm" would fail its
    # strict=True load (round-4 review finding)
    assert "image_encoder.model.fc_norm.weight" in sd
    assert "image_encoder.model.norm.weight" not in sd


def test_export_rejects_unconsumed_leaves():
    """A param leaf the walker doesn't know about must fail loudly, not
    silently drop out of the exported checkpoint."""
    _, params, batch_stats = _init_ours(
        ModelConfig(encoder_name="densenet121", image_dim=1024, spot_dim=16,
                    projection_dim=32, heads_num=4, heads_dim=8, head_layers=2)
    )
    params = dict(params)
    params["stray"] = {"leaf": np.zeros(3, np.float32)}
    with pytest.raises(ValueError, match="unexported"):
        export_reference_state_dict(params, batch_stats, _ATTN_CFG)
