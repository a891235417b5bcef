"""Train-step and state tests (CPU, tiny model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mclstexp_tpu.config import ModelConfig, TrainConfig
from mclstexp_tpu.data import pipeline, synthetic
from mclstexp_tpu.train.state import create_train_state, torch_adam
from mclstexp_tpu.train.step import make_train_step


TINY = ModelConfig(
    encoder_name="tiny_cnn", image_dim=128, spot_dim=16, projection_dim=8,
    heads_num=2, heads_dim=4,
)


def _data(num_spots=32, num_genes=16, patch=16):
    sections = synthetic.make_dataset(
        num_sections=2, num_spots=num_spots, num_genes=num_genes, patch_size=patch
    )
    return pipeline.ConcatSections.from_sections(sections)


def _sample(data, bs):
    b = data.take(np.arange(bs))
    return {
        "image": b["image_u8"].astype(np.float32) / 255.0,
        "expression": b["expression"],
        "position": b["position"],
    }


def test_torch_adam_matches_torch(rng):
    """One optimizer step vs torch.optim.Adam with coupled weight decay."""
    torch = pytest.importorskip("torch")

    w0 = rng.normal(size=(5,)).astype(np.float32)
    g = rng.normal(size=(5,)).astype(np.float32)
    lr, wd = 1e-2, 1e-1

    tw = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.Adam([tw], lr=lr, weight_decay=wd)
    tw.grad = torch.tensor(g.copy())
    opt.step()

    tx = torch_adam(lr, wd)
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)
    updates, _ = tx.update({"w": jnp.asarray(g)}, opt_state, params)
    new_w = np.asarray(params["w"] + updates["w"])
    np.testing.assert_allclose(new_w, tw.detach().numpy(), atol=1e-6)


def test_train_step_decreases_loss():
    data = _data()
    cfg = TrainConfig(batch_size=16, lr=1e-3, weight_decay=0.0, seed=0)
    model, state = create_train_state(TINY, cfg, _sample(data, 16))
    step_fn = make_train_step(model, augment_mode="none", donate=False)

    batch = data.take(np.arange(16))
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(30):
        state, loss = step_fn(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.5, losses[::10]


def test_train_step_with_augmentation_runs():
    data = _data()
    cfg = TrainConfig(batch_size=8, seed=0)
    model, state = create_train_state(TINY, cfg, _sample(data, 8))
    step_fn = make_train_step(model, augment_mode="st", donate=False)
    batch = data.take(np.arange(8))
    state, loss = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # augmentation is stochastic: same params, different rng -> different loss
    _, loss2 = step_fn(state, batch, jax.random.PRNGKey(2))
    assert float(loss) != float(loss2)


def test_batchnorm_stats_update():
    """Towers with BatchNorm (resnet18) must update running stats in train."""
    cfg_model = ModelConfig(
        encoder_name="res18", image_dim=512, spot_dim=16, projection_dim=8,
        heads_num=2, heads_dim=4,
    )
    data = _data(patch=32)
    cfg = TrainConfig(batch_size=8, seed=0)
    model, state = create_train_state(cfg_model, cfg, _sample(data, 8))
    assert state.batch_stats, "resnet18 should have batch_stats"
    step_fn = make_train_step(model, augment_mode="none", donate=False)
    before = jax.tree.map(np.asarray, state.batch_stats)
    state, _ = step_fn(state, data.take(np.arange(8)), jax.random.PRNGKey(0))
    after = jax.tree.map(np.asarray, state.batch_stats)
    leaves_changed = [
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after))
    ]
    assert any(leaves_changed)


def test_multi_device_step_matches_single(rng):
    """Loss on an 8-device data-sharded batch == single-device loss."""
    from mclstexp_tpu.parallel.mesh import make_mesh, shard_batch

    data = _data()
    cfg = TrainConfig(batch_size=16, seed=0)
    model, state = create_train_state(TINY, cfg, _sample(data, 16))
    step_fn = make_train_step(model, augment_mode="none", donate=False)
    batch = data.take(np.arange(16))

    _, loss_single = step_fn(state, batch, jax.random.PRNGKey(0))

    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    sharded = shard_batch(batch, mesh)
    _, loss_sharded = step_fn(state, sharded, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(loss_single), float(loss_sharded), rtol=2e-5)


def test_debug_nans_flag(tmp_path):
    """TrainConfig.debug_nans arms jax_debug_nans (SURVEY §5 sanitizer)
    *for the duration of the fold*: clean training runs unchanged, a NaN in
    the step raises a FloatingPointError instead of propagating silently,
    and the process-global flag is restored on return/raise so it can't
    leak into later train/eval calls (ADVICE r2 #3)."""
    import dataclasses

    from mclstexp_tpu.config import Config, DataConfig, EvalConfig, ModelConfig, TrainConfig
    from mclstexp_tpu.data import synthetic
    from mclstexp_tpu.train.loop import train_fold
    from mclstexp_tpu.utils.logging import MetricLogger

    sections = synthetic.make_dataset(num_sections=2, num_spots=16,
                                      num_genes=8, patch_size=16)
    cfg = Config(
        model=ModelConfig(encoder_name="tiny_cnn", image_dim=128, spot_dim=8,
                          projection_dim=8, heads_num=2, heads_dim=4,
                          head_layers=1),
        train=TrainConfig(batch_size=8, max_epochs=1, log_every=0,
                          checkpoint_dir=str(tmp_path / "ckpt"),
                          debug_nans=True),
        eval=EvalConfig(top_k=4),
        data=DataConfig(dataset="synthetic", num_folds=2),
    )
    assert not jax.config.jax_debug_nans
    # clean run: trains fine, flag restored afterwards
    train_fold(cfg, sections, 0, logger=MetricLogger(echo=False))
    assert not jax.config.jax_debug_nans

    # poisoned run: a NaN inside the jitted step raises instead of training
    # on (poison section 1 — fold 0 trains on it and holds section 0 out)
    bad = dataclasses.replace(sections[1], expression=np.full_like(
        np.asarray(sections[1].expression), np.nan))
    with pytest.raises(FloatingPointError):
        train_fold(cfg, [sections[0], bad], 0, logger=MetricLogger(echo=False))
    assert not jax.config.jax_debug_nans  # restored even on raise

    # unarmed, the same poison trains without raising (NaN propagates)
    cfg_off = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, debug_nans=False))
    train_fold(cfg_off, [sections[0], bad], 0, logger=MetricLogger(echo=False))
    assert not jax.config.jax_debug_nans


def test_checkpoint_resume_steps_after_restore(tmp_path):
    """Resume must reconstruct the optax namedtuple opt_state: Orbax's
    untyped restore returns plain dicts/lists, and the first tx.update after
    apply_checkpoint crashed on ScaleByAdamState.mu before the round-4 fix
    (the advertised mid-fold resumability never worked). Also pins that the
    resumed trajectory bit-continues the original."""
    from mclstexp_tpu.train import checkpoint as ckpt

    data = _data()
    model, state = create_train_state(TINY, TrainConfig(batch_size=8), _sample(data, 1))
    step = make_train_step(model, augment_mode="st", donate=False)
    batch = data.take(np.arange(8))
    state, _ = step(state, batch, jax.random.PRNGKey(0))

    d = str(tmp_path / "ck")
    ckpt.save_checkpoint(d, state)
    _, fresh = create_train_state(TINY, TrainConfig(batch_size=8), _sample(data, 1))
    resumed = ckpt.apply_checkpoint(fresh, ckpt.restore_checkpoint(d))
    assert int(resumed.step) == int(state.step)

    state, loss_orig = step(state, batch, jax.random.PRNGKey(1))
    resumed, loss_res = step(resumed, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(loss_res), float(loss_orig), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state.params, resumed.params,
    )

    # leaf-count mismatch (different optimizer) fails loudly, not at step time
    import dataclasses as _dc

    bad = ckpt.restore_checkpoint(d)
    bad["opt_state"] = {"not": {"the": np.zeros(1)}}
    with pytest.raises(ValueError, match="leaves"):
        ckpt.apply_checkpoint(fresh, bad)


def test_position_guard_rejects_negative_coords():
    from mclstexp_tpu.data.section import Section
    from mclstexp_tpu.train.loop import check_positions_in_vocab

    sec = Section(name="S", expression=np.zeros((2, 3), np.float32),
                  positions=np.array([[1, 2], [-3, 4]], np.int32),
                  centers=np.zeros((2, 2), np.int32))
    with pytest.raises(ValueError, match="negative position"):
        check_positions_in_vocab([sec], pos_vocab=64)
