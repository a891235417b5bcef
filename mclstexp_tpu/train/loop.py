"""Fold-loop training driver.

Drives what reference ``train.py:98-129`` does — leave-one-section-out
retraining from scratch per fold — over the jitted train step, with the
engineering the reference lacks: periodic resumable checkpoints, structured
metrics, throughput meters, and seeded determinism.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from mclstexp_tpu.config import Config
from mclstexp_tpu.data.pipeline import (
    ConcatSections,
    DeviceResidentData,
    device_train_batches,
    num_train_steps,
    prefetch_to_device,
    split_fold,
    train_batches,
)
from mclstexp_tpu.data.section import Section
from mclstexp_tpu.parallel.mesh import make_mesh
from mclstexp_tpu.train import checkpoint as ckpt
from mclstexp_tpu.train.state import TrainState, create_train_state
from mclstexp_tpu.train.step import make_train_step
from mclstexp_tpu.utils.logging import MetricLogger
from mclstexp_tpu.utils.meters import AvgMeter, Stopwatch


def _sample_batch(data: ConcatSections, batch_size: int) -> Dict[str, np.ndarray]:
    # Param shapes don't depend on batch size; init with one sample so the
    # (unjitted) flax init doesn't pay a full-batch CPU forward.
    del batch_size
    idx = np.arange(1)
    b = data.take(idx)
    return {
        "image": b["image_u8"].astype(np.float32) / 255.0,
        "expression": b["expression"],
        "position": b["position"],
    }


def train_fold(
    cfg: Config,
    sections: Sequence[Section],
    fold: int,
    logger: Optional[MetricLogger] = None,
    mesh=None,
    resume: bool = False,
) -> TrainState:
    """Train one leave-one-out fold from scratch; returns the final state.

    Checkpoints land in ``<checkpoint_dir>/<dataset>/<test section>/
    best_<fold>`` mirroring the reference layout (train.py:87-95).
    """
    logger = logger or MetricLogger()
    prev_debug_nans = bool(jax.config.jax_debug_nans)
    jax.config.update("jax_debug_nans", cfg.train.debug_nans)
    try:
        return _train_fold(cfg, sections, fold, logger, mesh, resume)
    finally:
        # restore: the flag is process-global and would otherwise leak into
        # later train/eval calls (disabling fusion) — ADVICE r2 #3.
        jax.config.update("jax_debug_nans", prev_debug_nans)


def check_positions_in_vocab(sections: Sequence[Section], pos_vocab: int) -> None:
    """Raise if any spot coordinate would index past the positional tables.

    The ST presets shrink the reference's 65536-row x/y tables to the rows
    actually reachable (config.py PRESETS note); jnp.take would silently
    clamp an out-of-range coordinate, so we fail loudly here instead."""
    for s in sections:
        m = int(np.max(s.positions)) if s.num_spots else 0
        if m >= pos_vocab:
            raise ValueError(
                f"section {s.name}: position coordinate {m} >= pos_vocab "
                f"{pos_vocab}; raise ModelConfig.pos_vocab, or remap raw "
                f"coords to dense rows first (DataConfig.pos_remap / "
                f"data/posremap.py — the visium preset default)"
            )
        lo = int(np.min(s.positions)) if s.num_spots else 0
        if lo < 0:
            # jnp.take's clip mode would silently read row 0 for these
            # (the reference's nn.Embedding raises on negatives)
            raise ValueError(
                f"section {s.name}: negative position coordinate {lo} — "
                f"corrupted spot file or a bad coordinate remap"
            )


def _train_fold(
    cfg: Config,
    sections: Sequence[Section],
    fold: int,
    logger: MetricLogger,
    mesh,
    resume: bool,
) -> TrainState:
    check_positions_in_vocab(sections, cfg.model.pos_vocab)
    train_secs, test_sec = split_fold(sections, fold)
    data = ConcatSections.from_sections(train_secs)

    mesh = mesh or make_mesh(cfg.train.mesh_shape, cfg.train.mesh_axes)
    model, state = create_train_state(
        cfg.model, cfg.train, _sample_batch(data, cfg.train.batch_size)
    )

    ckpt_dir = ckpt.fold_checkpoint_dir(
        cfg.train.checkpoint_dir, cfg.data.dataset, test_sec.name, fold
    )
    start_epoch = 0
    if resume and os.path.exists(ckpt_dir):
        restored = ckpt.restore_checkpoint(ckpt_dir)
        state = ckpt.apply_checkpoint(state, restored)
        steps_per_epoch = num_train_steps(len(data), cfg.train.batch_size)
        start_epoch = int(restored["step"]) // max(steps_per_epoch, 1)
        logger.log(event="resume", fold=fold, epoch=start_epoch)

    augment_mode = "tenx" if cfg.data.dataset == "visium" else "st"
    step_fn = make_train_step(
        model, augment_mode=augment_mode, donate=cfg.train.donate,
        rot_impl=cfg.train.rot_impl,
        tenx_raw_scale=cfg.data.visium_raw_scale,
    )

    # Keep the training set HBM-resident when it fits (reference scale is
    # 0.2-2 GB): per-step H2D shrinks from ~19 MB of patches to 128 indices.
    device_data = None
    raw_bytes = data.patches.nbytes + data.expression.nbytes + data.positions.nbytes
    if raw_bytes <= cfg.train.device_data_budget_bytes:
        device_data = DeviceResidentData(data, mesh=mesh)

    base_rng = jax.random.PRNGKey(cfg.train.seed + 1000 * fold)
    for epoch in range(start_epoch, cfg.train.max_epochs):
        loss_meter = AvgMeter("train_loss")
        watch = Stopwatch()  # per-epoch rate (epoch 0 includes compiles)
        if device_data is not None:
            batches = device_train_batches(
                device_data, cfg.train.batch_size, cfg.train.seed, epoch
            )
        else:
            batches = prefetch_to_device(
                train_batches(data, cfg.train.batch_size, cfg.train.seed, epoch),
                mesh=mesh,
            )
        # Losses stay on-device until a sync point: a per-step float() costs
        # a full host<->device round trip and serializes the pipeline.
        pending = []  # (device loss, batch size)
        for i, device_batch in enumerate(batches):
            rng = jax.random.fold_in(base_rng, epoch * 100000 + i)
            state, loss = step_fn(state, device_batch, rng)
            bs = len(device_batch["expression"])
            pending.append((loss, bs))
            watch.update(bs)
            if cfg.train.log_every and (i + 1) % cfg.train.log_every == 0:
                for val, n in pending:
                    loss_meter.update(float(val), n)
                pending.clear()
                logger.log(
                    fold=fold, epoch=epoch, step=i + 1,
                    loss=loss_meter.avg, spots_per_sec=watch.rate,
                )
        for val, n in pending:
            loss_meter.update(float(val), n)
        logger.log(fold=fold, epoch=epoch, epoch_loss=loss_meter.avg,
                   spots_per_sec=watch.rate)
        if (
            cfg.train.checkpoint_every_epochs
            and (epoch + 1) % cfg.train.checkpoint_every_epochs == 0
        ):
            ckpt_watch = Stopwatch()
            ckpt.save_checkpoint(ckpt_dir, state)
            logger.log(event="checkpoint", fold=fold, epoch=epoch,
                       seconds=ckpt_watch.elapsed)

    final_watch = Stopwatch()
    ckpt.save_checkpoint(ckpt_dir, state)
    logger.log(event="final_checkpoint", fold=fold, seconds=final_watch.elapsed)
    return state


def train_all_folds(
    cfg: Config,
    sections: Sequence[Section],
    folds: Optional[Sequence[int]] = None,
    logger: Optional[MetricLogger] = None,
) -> List[str]:
    """The reference's outer loop (train.py:100-128): every fold from scratch.
    Returns the checkpoint directories."""
    logger = logger or MetricLogger()
    folds = folds if folds is not None else range(len(sections))
    mesh = make_mesh(cfg.train.mesh_shape, cfg.train.mesh_axes)
    out = []
    for fold in folds:
        state = train_fold(cfg, sections, fold, logger=logger, mesh=mesh)
        test_name = sections[fold].name
        out.append(
            ckpt.fold_checkpoint_dir(
                cfg.train.checkpoint_dir, cfg.data.dataset, test_name, fold
            )
        )
        del state
    return out
