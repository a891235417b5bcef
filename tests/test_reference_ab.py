"""Whole-model A/B parity against the reference's OWN torch implementation.

Every component is golden-tested individually (towers, InfoNCE, Adam, the
projection heads), but composition-level divergence — dropout placement, a
dtype boundary, the expression+pos sum order — is exactly what per-component
goldens cannot catch. These tests import ``/root/reference/model.py``
verbatim (monkeypatching only the hard-coded ``.cuda()`` at model.py:243 and
the pretrained-weight downloads, impossible with zero egress), share weights
through ``import_reference_state_dict``, and assert:

  (a) forward-loss equality on a fixed batch, train- and eval-mode BN,
      for both the "attention" product model (model.py:201-247) and the
      "mlp" ablation (model.py:171-198);
  (b) B=32 eval-path embedding equality for both towers, reproducing the
      reference's batch-as-sequence sweep (evel_her2st.py:44-69) inline in
      torch;
  (c) a 10-step Adam training-trajectory match (lr 1e-4, coupled wd 1e-3 —
      reference train.py:30-42,118-120), loss per step and every param leaf
      after.

With no real datasets in this environment, this A/B is the strongest
available evidence for the ±0.005-PCC parity north star (BASELINE.md).
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
from mclstexp_tpu.data.section import Section
from mclstexp_tpu.models.image.torch_import import import_reference_state_dict
from mclstexp_tpu.models.mclstexp import MclSTExp
from mclstexp_tpu.train.state import TrainState, torch_adam
from mclstexp_tpu.train.step import make_train_step


pytestmark = pytest.mark.slow

REFERENCE_MODEL = "/root/reference/model.py"


@pytest.fixture(scope="module")
def refmod():
    if not os.path.exists(REFERENCE_MODEL):
        pytest.skip("reference checkout not mounted")
    # The env has no torchvision/timm; _torchvision_stub provides real
    # torch.nn densenet121/resnet18 with torchvision's exact naming (random
    # weights — weight EQUALITY across frameworks is what's under test).
    import _torchvision_stub

    _torchvision_stub.install()
    spec = importlib.util.spec_from_file_location("reference_model", REFERENCE_MODEL)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["reference_model"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def patched(refmod, monkeypatch):
    # model.py:194,243 hard-code .cuda() on the identity-label tensor.
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    torch.manual_seed(0)
    return refmod


def _make_batch(rng, n, g, patch):
    u8 = rng.integers(0, 256, size=(n, patch, patch, 3), dtype=np.uint8)
    expr = rng.normal(size=(n, g)).astype(np.float32)
    pos = rng.integers(0, 65536, size=(n, 2)).astype(np.int64)
    return u8, expr, pos


def _torch_batch(u8, expr, pos):
    img = torch.tensor(u8.astype(np.float32) / 255.0).permute(0, 3, 1, 2)
    return {
        "image": img,
        "expression": torch.tensor(expr),
        "position": torch.tensor(pos),
    }


def _to_flax(ref_model, cfg: ModelConfig):
    # .numpy() SHARES memory with the torch buffers — torch's in-place BN
    # running-stat updates and optimizer steps would silently mutate the
    # converted arrays; copy.
    sd = {
        k: np.array(v.detach().cpu().numpy())
        for k, v in ref_model.state_dict().items()
    }
    # mclSTExp_MLP names its tower `image_ecode` (reference model.py:176 typo)
    sd = {k.replace("image_ecode.", "image_encoder."): v for k, v in sd.items()}
    return import_reference_state_dict(sd, cfg)


_ATTN_KW = dict(
    temperature=1.0, image_dim=1024, spot_dim=16, projection_dim=32,
    heads_num=4, heads_dim=8, head_layers=2,
)
_ATTN_CFG = ModelConfig(
    encoder_name="densenet121", image_dim=1024, spot_dim=16, projection_dim=32,
    heads_num=4, heads_dim=8, head_layers=2,
)


def test_forward_loss_attention(patched):
    """(a) train- and eval-mode forward loss equality, attention variant."""
    ref = patched.mclSTExp_Attention(encoder_name="densenet121", **_ATTN_KW)
    params, batch_stats = _to_flax(ref, _ATTN_CFG)
    model = MclSTExp(_ATTN_CFG)

    rng = np.random.default_rng(1)
    u8, expr, pos = _make_batch(rng, 6, 16, 64)
    tb = _torch_batch(u8, expr, pos)
    batch = {
        "image": u8.astype(np.float32) / 255.0,
        "expression": expr,
        "position": pos.astype(np.int32),
    }

    # eval first: the train-mode forward mutates torch's BN running stats
    ref.eval()
    with torch.no_grad():
        ref_eval = float(ref(tb))
    ref.train()
    with torch.no_grad():
        ref_train = float(ref(tb))

    ie, se = model.apply({"params": params, "batch_stats": batch_stats}, batch)
    ours_eval = float(symmetric_infonce(se, ie, 1.0))
    (ie_t, se_t), _ = model.apply(
        {"params": params, "batch_stats": batch_stats}, batch, train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)},
    )
    ours_train = float(symmetric_infonce(se_t, ie_t, 1.0))

    np.testing.assert_allclose(ours_eval, ref_eval, rtol=1e-5, atol=1e-6)
    # train-mode BN normalizes by batch statistics, whose fp32 reduction
    # order differs across frameworks (observed ~5e-5 relative)
    np.testing.assert_allclose(ours_train, ref_train, rtol=3e-4, atol=1e-5)


def test_forward_loss_mlp(patched):
    """(a) forward loss equality, mclSTExp_MLP ablation (model.py:171-198)."""
    ref = patched.mclSTExp_MLP(
        temperature=1.0, image_embedding=1024, spot_embedding=16, projection_dim=32
    )
    cfg = ModelConfig(
        encoder_name="densenet121", image_dim=1024, spot_dim=16,
        projection_dim=32, variant="mlp",
    )
    params, batch_stats = _to_flax(ref, cfg)
    model = MclSTExp(cfg)

    rng = np.random.default_rng(2)
    u8, expr, pos = _make_batch(rng, 5, 16, 64)
    ref.eval()
    with torch.no_grad():
        ref_loss = float(ref(_torch_batch(u8, expr, pos)))
    batch = {
        "image": u8.astype(np.float32) / 255.0,
        "expression": expr,
        "position": pos.astype(np.int32),
    }
    ie, se = model.apply({"params": params, "batch_stats": batch_stats}, batch)
    ours = float(symmetric_infonce(se, ie, 1.0))
    np.testing.assert_allclose(ours, ref_loss, rtol=1e-5, atol=1e-6)


def test_eval_embeddings_b32(patched):
    """(b) the B=32 batch-as-sequence eval sweep (evel_her2st.py:44-69):
    embeddings from compute_embeddings == the reference towers run inline,
    including a batch straddling the tail remainder."""
    from mclstexp_tpu.infer.embed import compute_embeddings

    ref = patched.mclSTExp_Attention(encoder_name="densenet121", **_ATTN_KW)
    params, batch_stats = _to_flax(ref, _ATTN_CFG)
    model = MclSTExp(_ATTN_CFG)

    rng = np.random.default_rng(3)
    n, bs = 80, 32  # 2 full sequences + a 16-spot remainder sequence
    u8, expr, pos = _make_batch(rng, n, 16, 64)

    ref.eval()
    img_out, spot_out = [], []
    with torch.no_grad():
        for s in range(0, n, bs):
            tb = _torch_batch(u8[s:s + bs], expr[s:s + bs], pos[s:s + bs])
            # reference evel_her2st.py:48-49 (image side), :52-69 (spot side)
            img_out.append(ref.image_projection(ref.image_encoder(tb["image"])))
            x = tb["position"][:, 0].long()
            y = tb["position"][:, 1].long()
            feats = tb["expression"] + ref.x_embed(x) + ref.y_embed(y)
            enc = ref.spot_encoder(feats.unsqueeze(0))
            spot_out.append(ref.spot_projection(enc).squeeze(0))
    ref_img = torch.cat(img_out).numpy()
    ref_spot = torch.cat(spot_out).numpy()

    section = Section(
        name="ab", expression=expr, positions=pos.astype(np.int32),
        centers=np.zeros((n, 2), np.int32), patches=u8,
    )
    img, spot = compute_embeddings(
        model, params, batch_stats, [section], batch_size=bs
    )
    np.testing.assert_allclose(img, ref_img, rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(spot, ref_spot, rtol=1e-4, atol=2e-5)


def _grads_to_flax(ref_model, cfg: ModelConfig):
    """Map torch ``.grad`` tensors onto our param-tree layout by reusing the
    state-dict importer (BN buffers are passed through as placeholders and
    the batch_stats output discarded)."""
    sd = {}
    for k, v in ref_model.named_parameters():
        sd[k.replace("image_ecode.", "image_encoder.")] = np.array(
            v.grad.detach().cpu().numpy()
        )
    for k, v in ref_model.named_buffers():
        sd[k.replace("image_ecode.", "image_encoder.")] = np.array(
            v.detach().cpu().numpy()
        )
    grads, _ = import_reference_state_dict(sd, cfg)
    return grads


def _assert_trees_close(tree_ref, tree_ours, label, rtol, atol):
    flat_ref = jax.tree_util.tree_flatten_with_path(tree_ref)[0]
    flat_ours = jax.tree_util.tree_flatten_with_path(tree_ours)[0]
    assert [k for k, _ in flat_ref] == [k for k, _ in flat_ours]
    for (path, a), (_, b) in zip(flat_ref, flat_ours):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=rtol, atol=atol,
            err_msg=f"{label}{jax.tree_util.keystr(path)}",
        )


def test_adam_training_trajectory(patched):
    """(c) the reference training step (train.py:30-42: Adam lr 1e-4,
    coupled weight decay 1e-3, dropout 0, no augmentation) matches:

      1. the full backward pass — every gradient leaf equal at init;
      2. one Adam update — every param leaf equal after step 1;
      3. a 10-step loss trajectory within a noise envelope.

    (3) cannot be tight: both frameworks run fp32 and the contrastive
    objective + Adam's rsqrt amplify reduction-order noise geometrically
    (measured here: 5e-6 relative at step 0 -> ~1e-2 by step 9, with NO
    systematic bias — the same growth appears between two torch runs with
    permuted reduction order). (1) and (2) are the semantically tight
    assertions; (3) guards against systematic drift (wrong lr/decay/moment
    semantics would blow the envelope immediately)."""
    cfg = ModelConfig(
        encoder_name="res18", image_dim=512, spot_dim=12, projection_dim=16,
        heads_num=2, heads_dim=8, head_layers=2,
    )
    ref = patched.mclSTExp_Attention(
        encoder_name="res18", temperature=1.0, image_dim=512, spot_dim=12,
        projection_dim=16, heads_num=2, heads_dim=8, head_layers=2,
    )
    params, batch_stats = _to_flax(ref, cfg)
    model = MclSTExp(cfg)
    tx = torch_adam(1e-4, 1e-3)
    state = TrainState(
        step=np.int32(0), params=params, batch_stats=batch_stats,
        opt_state=tx.init(params), tx=tx,
    )
    step_fn = make_train_step(model, augment_mode="none", donate=False)

    opt = torch.optim.Adam(ref.parameters(), lr=1e-4, weight_decay=1e-3)
    ref.train()
    rng = np.random.default_rng(7)
    losses_ref, losses_ours = [], []
    for t in range(10):
        u8, expr, pos = _make_batch(rng, 8, 12, 32)
        loss = ref(_torch_batch(u8, expr, pos))
        opt.zero_grad()
        loss.backward()
        if t == 0:
            # (1) backward-pass equality, leaf-wise, BEFORE any update.
            # torch's Adam couples the weight-decay term into the gradient
            # only inside .step(), so .grad here is the pure loss gradient —
            # compare against jax.grad of the same loss.
            torch_grads = _grads_to_flax(ref, cfg)

            def loss_fn(p):
                (ie, se), _ = model.apply(
                    {"params": p, "batch_stats": state.batch_stats},
                    {
                        "image": u8.astype(np.float32) / 255.0,
                        "expression": expr,
                        "position": pos.astype(np.int32),
                    },
                    train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(0)},
                )
                from mclstexp_tpu.core.losses import symmetric_infonce as si

                return si(se, ie, 1.0)

            jax_grads = jax.jit(jax.grad(loss_fn))(state.params)
            # fp32 backward reduction-order noise accumulates to ~2e-4
            # absolute on O(1) grads at the earliest conv layers (longest
            # backprop chains); atol dominates for small-magnitude entries.
            # A semantic error (wrong wiring/scale) shifts whole tensors by
            # O(1), far outside these bounds.
            _assert_trees_close(torch_grads, jax_grads, "grad", 5e-3, 1e-3)
        opt.step()

        batch = {
            "image_u8": u8, "expression": expr, "position": pos.astype(np.int32)
        }
        state, jloss = step_fn(state, batch, jax.random.PRNGKey(t))
        if t == 0:
            # (2) one coupled-weight-decay Adam update, leaf-wise. Adam's
            # first step moves every param by ~±lr (g/sqrt(g^2) = sign(g)),
            # so where the true gradient is at noise level the SIGN can flip
            # between frameworks and the update differs by up to 2*lr
            # (observed: 3/147k elements at 1.998e-4 with lr 1e-4). A wrong
            # lr/decay/moment would shift entire tensors by ~lr instead.
            ref_params1, ref_stats1 = _to_flax(ref, cfg)
            _assert_trees_close(ref_params1, state.params, "params@1", 1e-4, 2.5e-4)
            _assert_trees_close(ref_stats1, state.batch_stats, "bn@1", 1e-4, 1e-6)
        losses_ref.append(float(loss.detach()))
        losses_ours.append(float(jloss))

    # (3) noise envelope over the 10-step trajectory
    rel = np.abs(np.asarray(losses_ours) - np.asarray(losses_ref)) / np.abs(
        np.asarray(losses_ref)
    )
    assert rel[0] < 1e-4, f"step-0 loss mismatch: {rel[0]}"
    assert (rel[:4] < 2e-3).all(), f"early-step drift: {rel[:4]}"
    assert (rel < 0.08).all(), f"trajectory diverged beyond noise: {rel}"
