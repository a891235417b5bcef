"""The minimum end-to-end slice (BASELINE.json config 1), CPU-runnable:

synthetic sections -> jitted contrastive training -> embedding dump ->
leave-one-out top-K retrieval -> HVG-PCC/MSE/MAE. Verifies the pipeline is
learnable: a trained model must retrieve substantially better than an
untrained one.
"""

import os

import jax
import numpy as np
import pytest

from mclstexp_tpu.config import Config, DataConfig, EvalConfig, ModelConfig, TrainConfig
from mclstexp_tpu.data import pipeline, synthetic
from mclstexp_tpu.infer import embed, evaluate
from mclstexp_tpu.train import checkpoint as ckpt
from mclstexp_tpu.train.loop import train_fold
from mclstexp_tpu.utils.logging import MetricLogger



pytestmark = pytest.mark.slow

def _cfg(tmp_path, epochs=12):
    return Config(
        model=ModelConfig(
            encoder_name="tiny_cnn", image_dim=128, spot_dim=24,
            projection_dim=16, heads_num=2, heads_dim=8, head_layers=1,
        ),
        train=TrainConfig(
            batch_size=32, max_epochs=epochs, lr=3e-3, weight_decay=0.0,
            seed=0, log_every=0, checkpoint_every_epochs=0,
            checkpoint_dir=str(tmp_path / "model_result"),
        ),
        eval=EvalConfig(batch_size=16, top_k=8, weight_ord=1),
        data=DataConfig(dataset="synthetic", num_folds=3),
    )


def _sections():
    return synthetic.make_dataset(
        num_sections=3, num_spots=48, num_genes=24, patch_size=16, seed=7
    )


def _eval_model(model, state, sections, cfg, fold):
    img, spot = embed.compute_embeddings(
        model, state.params, state.batch_stats, sections, cfg.eval.batch_size
    )
    sizes = [s.num_spots for s in sections]
    img_secs = embed.split_by_section(img, sizes)
    spot_secs = embed.split_by_section(spot, sizes)
    return evaluate.evaluate_fold(
        fold,
        img_secs[fold],
        spot_secs,
        [s.expression for s in sections],
        top_k=cfg.eval.top_k,
        weight_ord=cfg.eval.weight_ord,
    )


def test_end_to_end_slice(tmp_path):
    sections = _sections()
    cfg = _cfg(tmp_path)
    logger = MetricLogger(echo=False)
    fold = 0

    # untrained baseline
    from mclstexp_tpu.train.state import create_train_state
    from mclstexp_tpu.data.pipeline import ConcatSections, split_fold

    train_secs, _ = split_fold(sections, fold)
    data = ConcatSections.from_sections(train_secs)
    b = data.take(np.arange(cfg.train.batch_size))
    sample = {
        "image": b["image_u8"].astype(np.float32) / 255.0,
        "expression": b["expression"],
        "position": b["position"],
    }
    model, state0 = create_train_state(cfg.model, cfg.train, sample)
    untrained = _eval_model(model, state0, sections, cfg, fold)

    state = train_fold(cfg, sections, fold, logger=logger)
    trained = _eval_model(model, state, sections, cfg, fold)

    # learnability: trained retrieval must beat untrained clearly
    assert trained["hvg_pcc"] > untrained["hvg_pcc"] + 0.05, (untrained, trained)
    assert np.isfinite(trained["mse"]) and np.isfinite(trained["mae"])

    # checkpoint written in the reference layout
    test_name = sections[fold].name
    ckpt_dir = ckpt.fold_checkpoint_dir(
        cfg.train.checkpoint_dir, "synthetic", test_name, fold
    )
    assert os.path.exists(ckpt_dir)


def test_checkpoint_roundtrip(tmp_path):
    sections = _sections()
    cfg = _cfg(tmp_path, epochs=1)
    logger = MetricLogger(echo=False)
    state = train_fold(cfg, sections, 0, logger=logger)

    ckpt_dir = ckpt.fold_checkpoint_dir(
        cfg.train.checkpoint_dir, "synthetic", sections[0].name, 0
    )
    restored = ckpt.restore_checkpoint(ckpt_dir)
    for a, b in zip(
        jax.tree.leaves(jax.tree.map(np.asarray, state.params)),
        jax.tree.leaves(restored["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored["step"]) == int(state.step)


def test_embedding_dump_layout(tmp_path):
    sections = _sections()
    cfg = _cfg(tmp_path, epochs=1)
    from mclstexp_tpu.train.state import create_train_state
    from mclstexp_tpu.data.pipeline import ConcatSections

    data = ConcatSections.from_sections(sections)
    b = data.take(np.arange(8))
    sample = {
        "image": b["image_u8"].astype(np.float32) / 255.0,
        "expression": b["expression"],
        "position": b["position"],
    }
    model, state = create_train_state(cfg.model, cfg.train, sample)
    out_dir = str(tmp_path / "embeddings_0")
    embed.dump_embeddings(
        model, state.params, state.batch_stats, sections, out_dir, batch_size=16
    )
    for i, s in enumerate(sections):
        im = np.load(os.path.join(out_dir, f"img_embeddings_{i + 1}.npy"))
        sp = np.load(os.path.join(out_dir, f"spot_embeddings_{i + 1}.npy"))
        # reference layout: transposed (P, N_i)
        assert im.shape == (cfg.model.projection_dim, s.num_spots)
        assert sp.shape == (cfg.model.projection_dim, s.num_spots)
