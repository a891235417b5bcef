"""Slide-level training/eval driver for the baseline families.

The reference baselines train with Lightning at batch = 1 whole slide
(reference ``HIST2ST_train.py:92-98``, HisToGene tutorial cell 3), so the
"sequence" length is the section's spot count — a dynamic shape. The
TPU-idiomatic equivalent here pads every slide to a bucket size (multiple of
128) with an attention/loss mask, so XLA compiles one program per bucket
instead of one per section.

Losses per family:
  * HisToGene / THItoGene: masked MSE (``vis_model.py:169-173``,
    ``THItoGene/vis_model.py:209-213``);
  * Hist2ST: masked MSE + zinb_coef * ZINB(raw counts, size factors) +
    lamb * self-distillation over `bake` augmented forward passes
    (``HIST2ST.py:174-199``);
  * BLEEP: per-spot contrastive batches with the soft-target CLIP loss
    (``Bleep/BLEEP_main.py:60-80``) — reuses the shared batching pipeline.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mclstexp_tpu.baselines import losses as bl
from mclstexp_tpu.baselines.graph import knn_adjacency
from mclstexp_tpu.baselines.models import BLEEP, Hist2ST, HisToGene, THItoGene
from mclstexp_tpu.data.pipeline import split_fold
from mclstexp_tpu.data.section import Section
from mclstexp_tpu.infer.metrics import expression_metrics
from mclstexp_tpu.ops.augment import rotate_image
from mclstexp_tpu.train.state import TrainState, torch_adam
from mclstexp_tpu.utils.logging import MetricLogger
from mclstexp_tpu.utils.meters import AvgMeter


@dataclasses.dataclass(frozen=True)
class BaselineConfig:
    model: str = "histogene"  # histogene | hist2st | thitogene | bleep
    n_genes: int = 785
    patch_size: int = 112  # all three slide-level baselines use 112px figs
    n_pos: int = 64
    lr: Optional[float] = None  # None -> per-family reference default
    weight_decay: Optional[float] = None  # None -> per-family reference default
    max_epochs: Optional[int] = None  # None -> per-family reference default
    n_layers: Optional[int] = None  # slide-ViT depth; None -> family flow
    # default (HisToGene tutorial trains n_layers=8; THItoGene/train.py uses
    # 4 for her2st and 8 for cscc — the CLI resolves the dataset)
    seed: int = 0
    bucket: int = 128  # slide padding granularity
    # Hist2ST extras (reference HIST2ST_train.py defaults: zinb .25, bake 5, lamb .5)
    zinb_coef: float = 0.25
    nb: bool = False
    bake: Optional[int] = None  # augmented distillation passes; None -> family default
    lamb: float = 0.5
    # Hist2ST LR schedule (reference HIST2ST.py:237: StepLR(step_size=50, gamma=0.9),
    # stepped per epoch by Lightning)
    lr_step_epochs: int = 50
    lr_gamma: float = 0.9
    # graph (Hist2ST uses k=4 'grid'; THItoGene k=4)
    knn_k: int = 4
    knn_prune: str = "grid"
    dropout: float = 0.2
    dtype: str = "float32"
    # BLEEP extras
    batch_size: int = 128
    encoder_name: str = "resnet50"
    temperature: float = 1.0


# Reference training-protocol defaults per family — taken from each
# family's RUNNABLE training flow, not from constructor/argparse defaults
# its entry never uses:
#   HisToGene  Adam lr 1e-5, 100 epochs, n_layers=8
#              (tutorial.ipynb cell 3: HisToGene(n_layers=8, ...,
#               learning_rate=1e-5); Trainer(max_epochs=100) — the only
#               training entry; the vis_model.py:145 constructor defaults
#               4/1e-4 are never exercised)
#   Hist2ST    Adam lr 1e-5 + StepLR, 350 epochs
#              (HIST2ST_train.py:17,21; HIST2ST.py:237)
#   THItoGene  Adam lr 1e-5, 300 epochs, n_layers 4 her2st / 8 cscc
#              (THItoGene/train.py:19-23,92: THItoGene(..., learning_rate=
#               1e-5, n_layers=4|8); train(i, ViT_HER2ST, 300, ...))
#   BLEEP      AdamW lr 1e-3 wd 1e-3, 4 epochs
#              (Bleep/config.py:7-8, BLEEP_main.py:20,154-156)
_FAMILY_LR = {"histogene": 1e-5, "hist2st": 1e-5, "thitogene": 1e-5, "bleep": 1e-3}
_FAMILY_WD = {"histogene": 0.0, "hist2st": 0.0, "thitogene": 0.0, "bleep": 1e-3}
_FAMILY_EPOCHS = {"histogene": 100, "hist2st": 350, "thitogene": 300, "bleep": 4}
_FAMILY_N_LAYERS = {"histogene": 8, "thitogene": 4}


def resolve_lr(cfg: BaselineConfig) -> float:
    return cfg.lr if cfg.lr is not None else _FAMILY_LR[cfg.model]


def resolve_weight_decay(cfg: BaselineConfig) -> float:
    return cfg.weight_decay if cfg.weight_decay is not None else _FAMILY_WD[cfg.model]


def resolve_epochs(cfg: BaselineConfig) -> int:
    return cfg.max_epochs if cfg.max_epochs is not None else _FAMILY_EPOCHS[cfg.model]


def resolve_n_layers(cfg: BaselineConfig) -> int:
    return cfg.n_layers if cfg.n_layers is not None else _FAMILY_N_LAYERS[cfg.model]


def resolve_bake(cfg: BaselineConfig) -> int:
    # reference Hist2ST default --bake 5 (HIST2ST_train.py:24); others have none
    if cfg.bake is not None:
        return cfg.bake
    return 5 if cfg.model == "hist2st" else 0


def build_baseline(cfg: BaselineConfig):
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    if cfg.model == "histogene":
        return HisToGene(
            n_genes=cfg.n_genes, patch_size=cfg.patch_size, n_pos=cfg.n_pos,
            n_layers=resolve_n_layers(cfg), dropout=0.1, dtype=dtype,
        )
    if cfg.model == "hist2st":
        return Hist2ST(
            n_genes=cfg.n_genes, fig_size=cfg.patch_size, n_pos=cfg.n_pos,
            dropout=cfg.dropout, zinb=cfg.zinb_coef > 0, nb=cfg.nb,
            coef_head=resolve_bake(cfg) > 0, dtype=dtype,
        )
    if cfg.model == "thitogene":
        return THItoGene(
            n_genes=cfg.n_genes, patch_size=cfg.patch_size, n_pos=cfg.n_pos,
            n_layers=resolve_n_layers(cfg), dropout=cfg.dropout, dtype=dtype,
        )
    if cfg.model == "bleep":
        return BLEEP(
            spot_dim=cfg.n_genes, encoder_name=cfg.encoder_name,
            temperature=cfg.temperature, dtype=dtype,
        )
    raise KeyError(f"unknown baseline {cfg.model!r}")


def pad_slide(section: Section, bucket: int, with_adj: bool, cfg: BaselineConfig):
    """Pad one section's arrays to the next bucket multiple; returns dict."""
    n = section.num_spots
    padded = ((n + bucket - 1) // bucket) * bucket
    pad = padded - n

    def pad0(a, value=0):
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return np.pad(np.asarray(a), widths, constant_values=value)

    out = {
        "patches": pad0(np.asarray(section.patches)),
        "positions": pad0(section.positions),
        "expression": pad0(section.expression),
        "mask": np.concatenate([np.ones(n, bool), np.zeros(pad, bool)]),
    }
    if section.counts is not None:
        out["counts"] = pad0(section.counts)
        sf = section.size_factors
        out["size_factors"] = np.concatenate([sf, np.ones(pad, np.float32)])
    if with_adj:
        adj = knn_adjacency(section.positions, k=cfg.knn_k, prune=cfg.knn_prune)
        full = np.zeros((padded, padded), np.float32)
        full[:n, :n] = adj
        out["adj"] = full
    return out


def masked_mse(pred: jax.Array, target: jax.Array, mask: jax.Array) -> jax.Array:
    err = jnp.square(pred - target) * mask[:, None]
    return jnp.sum(err) / (jnp.sum(mask) * pred.shape[1])


def _bake_augment(key: jax.Array, patches: jax.Array, n_bake: int) -> jax.Array:
    """Hist2ST's distillation augmentation (HIST2ST.py:53-57,160-166):
    RandomGrayscale(0.1) + RandomRotation(90) + RandomHorizontalFlip(0.2),
    applied to the whole slide per bake."""
    from mclstexp_tpu.ops.augment import _luma

    def one_bake(k):
        kg, kr, kf = jax.random.split(k, 3)
        gray = jax.random.bernoulli(kg, 0.1)
        angle = jax.random.uniform(kr, (), minval=-90.0, maxval=90.0)
        flip = jax.random.bernoulli(kf, 0.2)

        def per_img(im):
            g = _luma(im)[..., None] * jnp.ones_like(im)
            im2 = jnp.where(gray, g, im)
            im2 = rotate_image(im2, angle, order=0)
            return jnp.where(flip, im2[:, ::-1, :], im2)

        return jax.vmap(per_img)(patches)

    return jax.vmap(one_bake)(jax.random.split(key, n_bake))


def _slide_loss(
    model, cfg: BaselineConfig, params, batch_stats,
    batch: Dict[str, jax.Array], rng: jax.Array,
):
    """(loss, new_batch_stats) of ONE padded slide — the per-slide math
    shared by the sequential step and the vmapped slide-DP step."""
    uses_adj = cfg.model in ("hist2st", "thitogene")
    n_bake = resolve_bake(cfg)
    drop_rng, bake_rng = jax.random.split(rng)
    patches = batch["patches"].astype(jnp.float32) / 255.0
    mask = batch["mask"]

    def apply_model(pats, train, aug=False, rng_=None, bs=None):
        variables = {"params": params,
                     "batch_stats": batch_stats if bs is None else bs}
        kwargs = dict(train=train, mask=mask)
        if aug:
            kwargs["aug"] = True
        args = (pats, batch["positions"])
        if uses_adj:
            args = args + (batch["adj"],)
        return model.apply(
            variables, *args, **kwargs,
            mutable=["batch_stats"] if train else [],
            rngs={"dropout": drop_rng if rng_ is None else rng_},
        )

    out, updates = apply_model(patches, True)
    new_bs = updates.get("batch_stats", batch_stats)
    if cfg.model == "hist2st":
        pred, extra, h = out
    else:
        pred, extra, h = out, None, None
    loss = masked_mse(pred, batch["expression"], mask)
    if cfg.model == "hist2st" and extra is not None and "counts" in batch:
        # mask: pad rows would otherwise contribute a strictly positive
        # zero_case term and dilute the mean — the pad-exactness invariant
        # covers the AUXILIARY losses too (round-4 review finding)
        if cfg.nb:
            r, p = extra
            ll = bl.nb_loss(batch["counts"], r, p, mask=mask)
        else:
            m, d, pi = extra
            ll = bl.zinb_loss(batch["counts"], m, d, pi, batch["size_factors"],
                              mask=mask)
        loss = loss + cfg.zinb_coef * ll
    if cfg.model == "hist2st" and n_bake > 0:
        baked = _bake_augment(bake_rng, patches, n_bake)
        use_coef = getattr(model, "coef_head", False)
        preds, coefs = [], []
        for i in range(n_bake):
            # fresh dropout stream per bake, like torch's per-forward draws;
            # BN running stats CHAIN through every bake forward — the
            # reference's aug() runs each bake in train mode, so torch
            # updates running_mean/var 1+bake times per step
            # (HIST2ST.py:160-166; round-4 review finding)
            (bp, _, bc), bake_upd = apply_model(
                baked[i], True, aug=use_coef,
                rng_=jax.random.fold_in(drop_rng, i + 1), bs=new_bs,
            )
            new_bs = bake_upd.get("batch_stats", new_bs)
            preds.append(bp)
            coefs.append(bc)
        if use_coef:
            # learned distillation weights: softmax of coef(h) ACROSS bakes,
            # per spot (reference HIST2ST.py:133-141)
            w = jax.nn.softmax(jnp.stack(coefs), axis=0)  # (bake, N, 1)
            new_pred = jnp.sum(jnp.stack(preds) * w, axis=0)
        else:
            new_pred = jnp.mean(jnp.stack(preds), axis=0)
        loss = loss + cfg.lamb * masked_mse(new_pred, pred, mask)
    return loss, new_bs


def make_slide_step(model, cfg: BaselineConfig, donate: bool = True) -> Callable:
    """Jitted per-slide train step for the regression baselines."""

    def step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        def loss_fn(params):
            return _slide_loss(model, cfg, params, state.batch_stats, batch, rng)

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, new_bs), loss

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_slide_dp_step(model, cfg: BaselineConfig, donate: bool = True) -> Callable:
    """Slide-per-device data parallelism for the slide baselines.

    batch: every leaf stacked (D, ...) over D equally-padded slides; rngs
    (D, 2) per-slide keys. The loss is the MEAN of the per-slide losses and
    one Adam step consumes the mean gradient — exactly what torch DDP with
    batch=1 slide per rank computes (the reference never distributes these
    baselines; its only DDP is BLEEP). Shard the slide axis over a mesh
    "data" axis to spread slides across devices. BN batch statistics are
    averaged across slides (DDP keeps rank-local stats and implicitly
    ships rank 0's at save; the average is the symmetric choice —
    documented divergence). NOTE: D slides per optimizer step is a
    DIFFERENT trajectory from the reference's strictly sequential
    one-slide-per-step Lightning flow — this is a scaling mode, not the
    parity default.
    """

    def step(state: TrainState, batch: Dict[str, jax.Array], rngs: jax.Array):
        def loss_fn(params):
            def one(b, r):
                return _slide_loss(model, cfg, params, state.batch_stats, b, r)

            losses, new_bs = jax.vmap(one)(batch, rngs)
            mean_bs = jax.tree.map(lambda x: jnp.mean(x, axis=0), new_bs)
            return jnp.mean(losses), mean_bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, new_bs), loss

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def baseline_optimizer(
    cfg: BaselineConfig, steps_per_epoch: int = 1
) -> "optax.GradientTransformation":
    """The reference family's optimizer chain (see _FAMILY_LR table).

    Hist2ST additionally carries StepLR(step_size=50, gamma=0.9) stepped once
    per epoch (reference ``HIST2ST.py:234-238``); with a known steps_per_epoch
    that is exactly lr * gamma^((step // steps_per_epoch) // 50)."""
    import optax

    lr = resolve_lr(cfg)
    wd = resolve_weight_decay(cfg)
    if cfg.model == "bleep":
        # torch.optim.AdamW == optax.adamw (decoupled decay)
        return optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd)
    if cfg.model == "hist2st" and cfg.lr_step_epochs > 0:
        spe = max(1, steps_per_epoch)

        def schedule(step):
            epoch = step // spe
            return lr * cfg.lr_gamma ** (epoch // cfg.lr_step_epochs)

        return torch_adam(schedule, wd)
    return torch_adam(lr, wd)


def init_baseline(
    cfg: BaselineConfig,
    section: Section,
    rng: Optional[jax.Array] = None,
    steps_per_epoch: int = 1,
) -> Tuple[Any, TrainState]:
    model = build_baseline(cfg)
    rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
    batch = pad_slide(section, cfg.bucket, cfg.model in ("hist2st", "thitogene"), cfg)
    patches = batch["patches"][: cfg.bucket].astype(np.float32) / 255.0
    args = (patches, batch["positions"][: cfg.bucket])
    if cfg.model in ("hist2st", "thitogene"):
        args = args + (batch["adj"][: cfg.bucket, : cfg.bucket],)

    def _init():
        if cfg.model == "bleep":
            return model.init(
                {"params": rng, "dropout": rng},
                {"image": patches[:2], "expression": batch["expression"][:2]},
            )
        # aug=True creates the bake-distillation coef head's params
        kw = {"aug": True} if getattr(model, "coef_head", False) else {}
        return model.init({"params": rng, "dropout": rng}, *args, **kw)

    # unjitted flax init on a remote TPU transport is pathological —
    # init on the host CPU and transfer once (see train/state.py)
    default_platform = jax.local_devices()[0].platform
    if default_platform != "cpu":
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            variables = _init()
    else:
        variables = _init()
    tx = baseline_optimizer(cfg, steps_per_epoch)
    params = variables["params"]
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        tx=tx,
    )
    if default_platform != "cpu":
        state = jax.device_put(state, jax.local_devices()[0])
        jax.block_until_ready(state.params)
    return model, state


def train_baseline_fold(
    cfg: BaselineConfig,
    sections: Sequence[Section],
    fold: int,
    logger: Optional[MetricLogger] = None,
    mesh=None,
    slides_per_step: int = 1,
) -> Tuple[Any, TrainState]:
    """Leave-one-out training of a slide-level baseline.

    Default: the reference's strictly sequential one-slide-per-optimizer-
    step Lightning flow. mesh and/or slides_per_step > 1 switch to the
    slide-DP scaling mode (``make_slide_dp_step``): D equally-padded slides
    per step, mean loss/gradient, slide axis sharded over the mesh's "data"
    axis — torch-DDP-at-batch-1 semantics, NOT the sequential trajectory.
    """
    logger = logger or MetricLogger()
    train_secs, _ = split_fold(sections, fold)
    uses_adj = cfg.model in ("hist2st", "thitogene")
    dp = mesh is not None or slides_per_step > 1
    d_slides = (
        slides_per_step if slides_per_step > 1
        else (mesh.shape["data"] if mesh is not None else 1)
    )
    steps_per_epoch = -(-len(train_secs) // d_slides) if dp else len(train_secs)
    model, state = init_baseline(cfg, train_secs[0], steps_per_epoch=steps_per_epoch)

    rng = jax.random.PRNGKey(cfg.seed)
    order_rng = np.random.default_rng(cfg.seed)

    if dp:
        # stacking needs one common padded extent: every slide pads to the
        # training set's max bucket (masks keep the math exact)
        target = max(
            ((s.num_spots + cfg.bucket - 1) // cfg.bucket) * cfg.bucket
            for s in train_secs
        )
        padded = [pad_slide(s, target, uses_adj, cfg) for s in train_secs]
        dp_step = make_slide_dp_step(model, cfg)
        from mclstexp_tpu.parallel.mesh import shard_batch

        for epoch in range(resolve_epochs(cfg)):
            meter = AvgMeter("loss")
            perm = order_rng.permutation(len(padded))
            for start in range(0, len(perm), d_slides):
                chunk = perm[start:start + d_slides]
                stacked = {
                    k: np.stack([padded[i][k] for i in chunk])
                    for k in padded[chunk[0]]
                }
                if mesh is not None:
                    stacked = shard_batch(stacked, mesh)
                else:
                    stacked = {k: jnp.asarray(v) for k, v in stacked.items()}
                rngs = jnp.stack([
                    jax.random.fold_in(rng, epoch * 1000 + int(i)) for i in chunk
                ])
                state, loss = dp_step(state, stacked, rngs)
                meter.update(float(loss), len(chunk))
            logger.log(model=cfg.model, fold=fold, epoch=epoch, loss=meter.avg)
        return model, state

    step_fn = make_slide_step(model, cfg)
    padded = [pad_slide(s, cfg.bucket, uses_adj, cfg) for s in train_secs]
    for epoch in range(resolve_epochs(cfg)):
        meter = AvgMeter("loss")
        for i in order_rng.permutation(len(padded)):
            batch = {k: jnp.asarray(v) for k, v in padded[i].items()}
            state, loss = step_fn(
                state, batch, jax.random.fold_in(rng, epoch * 1000 + int(i))
            )
            meter.update(float(loss))
        logger.log(model=cfg.model, fold=fold, epoch=epoch, loss=meter.avg)
    return model, state


def predict_slide(model, state, section: Section, cfg: BaselineConfig) -> np.ndarray:
    """(N, G) predictions for one section."""
    uses_adj = cfg.model in ("hist2st", "thitogene")
    batch = pad_slide(section, cfg.bucket, uses_adj, cfg)
    patches = jnp.asarray(batch["patches"]).astype(jnp.float32) / 255.0
    args = (patches, jnp.asarray(batch["positions"]))
    if uses_adj:
        args = args + (jnp.asarray(batch["adj"]),)
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        *args, train=False, mask=jnp.asarray(batch["mask"]),
    )
    pred = out[0] if cfg.model == "hist2st" else out
    return np.asarray(pred)[: section.num_spots]


def make_bleep_step(model: BLEEP, cfg: BaselineConfig) -> Callable:
    """Per-spot contrastive step (reference ``Bleep/BLEEP_main.py:60-80``)."""

    def step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        images = batch["image_u8"].astype(jnp.float32) / 255.0

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (image_emb, spot_emb), updates = model.apply(
                variables,
                {"image": images, "expression": batch["expression"]},
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            loss = bl.bleep_clip_loss(spot_emb, image_emb, cfg.temperature)
            return loss, updates.get("batch_stats", state.batch_stats)

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, new_bs), loss

    return jax.jit(step, donate_argnums=(0,))


def train_bleep_fold(
    cfg: BaselineConfig,
    sections: Sequence[Section],
    fold: int,
    logger: Optional[MetricLogger] = None,
    mesh=None,
) -> Tuple[Any, TrainState]:
    """BLEEP fold training; pass a mesh for data-parallel batches.

    The reference's only distributed training is BLEEP's DDP
    (``Bleep/BLEEP_main.py:57,76-78,147``). Here DP is the standard
    TPU-native form: batches sharded over the mesh's "data" axis under one
    jitted step, with XLA inserting the embedding all-gathers because
    ``bleep_clip_loss``'s B x B similarity matrices (logits AND the
    intra-modal soft targets) consume the full global batch — so the
    objective is bit-equal to single-device training, unlike DDP's
    per-rank-local loss. (The slide-level baselines keep the reference's
    strictly sequential one-slide-per-step Lightning semantics; batching
    slides across devices would change the optimizer trajectory, and the
    reference never distributes them.)
    """
    from mclstexp_tpu.data.pipeline import ConcatSections, train_batches
    from mclstexp_tpu.parallel.mesh import shard_batch

    logger = logger or MetricLogger()
    train_secs, _ = split_fold(sections, fold)
    data = ConcatSections.from_sections(train_secs)
    model, state = init_baseline(cfg, train_secs[0])
    step_fn = make_bleep_step(model, cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    for epoch in range(resolve_epochs(cfg)):
        meter = AvgMeter("loss")
        for i, batch in enumerate(train_batches(data, cfg.batch_size, cfg.seed, epoch)):
            if mesh is not None:
                device_batch = shard_batch(batch, mesh)
            else:
                device_batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, loss = step_fn(
                state, device_batch, jax.random.fold_in(rng, epoch * 100000 + i)
            )
            meter.update(float(loss), len(batch["expression"]))
        logger.log(model="bleep", fold=fold, epoch=epoch, loss=meter.avg)
    return model, state


def bleep_embeddings(
    model: BLEEP, state: TrainState, sections: Sequence[Section], batch_size: int = 32
) -> Tuple[np.ndarray, np.ndarray]:
    """(image, spot) projections for retrieval eval (BLEEP's inference mirrors
    mclSTExp's: top-K cosine over spot embeddings, simple/weighted average)."""
    from mclstexp_tpu.data.pipeline import ConcatSections, eval_batches

    data = ConcatSections.from_sections(sections)

    @jax.jit
    def embed(params, batch_stats, images, expression):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            {"image": images, "expression": expression},
            train=False,
        )

    img_out, spot_out = [], []
    for batch in eval_batches(data, batch_size):
        images = jnp.asarray(batch["image_u8"]).astype(jnp.float32) / 255.0
        ie, se = embed(state.params, state.batch_stats, images, jnp.asarray(batch["expression"]))
        img_out.append(np.asarray(ie))
        spot_out.append(np.asarray(se))
    return np.concatenate(img_out), np.concatenate(spot_out)


def evaluate_baseline_fold(
    cfg: BaselineConfig, sections: Sequence[Section], fold: int, model, state
) -> Dict[str, float]:
    """Per-gene PCC / MSE / MAE of the held-out slide (the reference
    baselines' test metric, e.g. ``HIST2ST_train.py:100-104``)."""
    test = sections[fold]
    pred = predict_slide(model, state, test, cfg)
    return expression_metrics(pred, test.expression)
