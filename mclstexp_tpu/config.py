"""Configuration dataclasses and dataset presets.

Replaces the reference's per-script argparse blocks (reference
``train.py:11-27``) and hard-coded Windows data paths
(``dataset.py:22,148-153``, ``train.py:64-74``) with one typed config
tree plus named presets for the three benchmark datasets.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Flagship contrastive model hyper-parameters.

    Defaults mirror the reference protocol (reference ``train.py:13-26``):
    DenseNet121 image tower (1024-d features), 785-d spot features (HER2ST
    HVG panel), 256-d projections, 2 attention blocks of 8 heads x 64.
    """

    encoder_name: str = "densenet121"
    image_dim: int = 1024  # feature dim emitted by the image tower
    spot_dim: int = 785  # number of HVGs == spot feature dim
    projection_dim: int = 256
    heads_num: int = 8
    heads_dim: int = 64
    head_layers: int = 2
    dropout: float = 0.0
    temperature: float = 1.0
    pos_vocab: int = 65536  # learnable (x, y) table size (reference model.py:204)
    variant: str = "attention"  # "attention" | "mlp" (ablation, model.py:171)
    # Compute dtype for the towers. Params are always fp32; bf16 activations
    # keep matmuls on the MXU fast path. Loss math is always fp32.
    dtype: str = "float32"
    # Spot-attention backend: "xla" (fused, optimal at reference batch
    # sizes), "flash" (Pallas kernel for long block-aligned sequences),
    # "ring" (sequence-parallel over a "seq" mesh axis for mega-slides).
    attn_backend: str = "xla"
    pretrained_path: Optional[str] = None  # torch state_dict (.pt) to import
    # Rematerialize image-tower dense layers in the backward pass. Saves
    # activation HBM *capacity* (larger batches/towers fit); measured
    # net-NEGATIVE for step time on v5e at B=128 (82.5 vs 77.8 ms,
    # PROFILE_r02.md), so default off. Numerics equal to bf16 recompute
    # noise; encoders without wired support ignore it (registry.py).
    # remat_tower=True makes densenet use the CONCAT materialization
    # regardless of dense_block_impl (the concat buffer is exactly what
    # remat checkpoints; densenet.py:DenseBlock).
    remat_tower: bool = False
    # DenseNet dense-connectivity materialization (numerically equivalent —
    # piecewise re-associates the conv1 channel reduction, fp-noise-level
    # deltas vs concat, rtol ~2e-5 — with an IDENTICAL param tree; only
    # densenet towers consume it):
    #   "piecewise<m>" — never materialize the per-layer prefix concat; each
    #       layer's BN-relu-conv1 runs piece-by-piece against channel-sliced
    #       params, and every m new feature pieces bundle into one contiguous
    #       buffer (written once) to keep the conv1 contraction deep on the
    #       MXU. Same-chip A/B sweep (B=128 flagship, ms/step,
    #       PROFILE_r03.md): piecewise 63.1, piecewise4 64.8, piecewise8
    #       60.2 (shipping default), piecewise12 60.8, piecewise16 61.4.
    #   "concat" — torchvision semantics verbatim (a fresh prefix copy per
    #       layer, 8.2 ms/step of the trace; 67.8 ms/step).
    #   "dus" — preallocated buffer + dynamic_update_slice; measured
    #       net-NEGATIVE (105.6 ms/step — XLA materializes the full-extent
    #       buffer per layer, PROFILE_r03.md). Kept as a documented rejection.
    dense_block_impl: str = "piecewise8"


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 128  # global batch; sharded over the data mesh axis
    max_epochs: int = 90
    lr: float = 1e-4
    weight_decay: float = 1e-3  # torch-Adam style L2 (coupled), train.py:118-120
    seed: int = 0
    log_every: int = 50
    checkpoint_every_epochs: int = 10  # reference saves only at the end; we
    # checkpoint periodically so a crash never loses a fold (SURVEY §5).
    checkpoint_dir: str = "model_result"
    donate: bool = True
    # Rotation implementation for train-time augmentation: "paeth" (Pallas
    # 3-shear, ~5x faster, statistically equivalent resampling) or "gather"
    # (torchvision-exact nearest-neighbor). See ops/augment.rotate_batch_paeth.
    rot_impl: str = "paeth"
    mesh_shape: Optional[Tuple[int, ...]] = None  # None -> 1D data mesh over all devices
    mesh_axes: Tuple[str, ...] = ("data",)
    # NaN sanitizer (SURVEY §5: JAX's answer to the reference's absent race/
    # numerics tooling): aborts the step with a located traceback the moment
    # any jitted op produces a NaN. Debug-only — disables some fusion.
    debug_nans: bool = False
    # Datasets up to this size live in HBM; larger ones stream with prefetch.
    device_data_budget_bytes: int = 4 * 1024**3


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    batch_size: int = 32  # reference eval batching (evel_her2st.py:24); the
    # spot tower sees each batch as one sequence, so this is load-bearing.
    top_k: int = 200
    weight_ord: int = 1  # distance order for 1/d^2 weights: 1 (her2st) or 2
    embedding_dir: str = "embedding_result"
    prediction_dir: str = "prediction_result"


@dataclasses.dataclass(frozen=True)
class DataConfig:
    dataset: str = "her2st"  # her2st | cscc | visium | synthetic
    data_root: str = ""  # root of raw dataset files
    gene_panel: str = ""  # path to the HVG panel (.npy of gene names)
    preprocessed_root: str = "data/preprocessed_expression_matrices"
    patch_size: int = 224
    num_folds: int = 32
    # Patch cache: pre-cut uint8 patches stored once per section as .npy
    # (replaces the reference's per-epoch PIL crops, dataset.py:224).
    patch_cache_dir: str = "patch_cache"
    eval_time_augment: bool = False  # TenxDataset quirk: the reference
    # applies random flips/rotations even at inference (dataset.py:316-325);
    # set True for strict parity on Visium.
    pos_remap: bool = False  # remap observed raw coords to dense row ids at
    # load time (data/posremap.py) and shrink ModelConfig.pos_vocab to the
    # observed-value count — exact per-coordinate semantics, a fraction of
    # the 65536-row tables' optimizer/layout traffic. Visium preset default
    # (its raw pixel coords are why the reference needs 65536 rows,
    # dataset.py:316-341).
    visium_raw_scale: bool = False  # TenxDataset quirk: the reference feeds
    # Visium patches as RAW 0-255 floats — `torch.tensor(image).permute(...)
    # .float()` with no /255 (dataset.py:336) — at train AND eval. True (the
    # visium preset default) skips the [0,1] rescale for bit-parity; False
    # uses the [0,1] convention shared by the other datasets.


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


# Feature dims of the supported image towers (reference model.py:72-148;
# dims from train.py:18 and the torchvision/timm architectures).
ENCODER_DIMS = {
    "densenet121": 1024,
    "resnet50": 2048,
    "res101": 2048,
    "res18": 512,
    "vit": 768,  # vit_base_patch32_224, global-average-pooled tokens
    # BLEEP's wider menu (reference baselines/Bleep/modules.py:7-132)
    "resnet152": 2048,
    "vit_l": 1024,  # vit_large_patch32_224_in21k
    "clip_vit": 768,  # vit_base_patch32_224_clip_laion2b (pre-norm trunk)
    "tiny_cnn": 128,  # test-sized tower (ours; no reference equivalent)
    "tiny_densenet": 16,  # test-sized densenet code paths (ours)
}


def _preset(
    dataset: str,
    spot_dim: int,
    num_folds: int,
    top_k: int,
    weight_ord: int,
    eval_time_augment: bool = False,
    visium_raw_scale: bool = False,
    pos_vocab: int = 65536,
    pos_remap: bool = False,
) -> Config:
    return Config(
        model=ModelConfig(spot_dim=spot_dim, pos_vocab=pos_vocab),
        train=TrainConfig(),
        eval=EvalConfig(top_k=top_k, weight_ord=weight_ord),
        data=DataConfig(
            dataset=dataset,
            num_folds=num_folds,
            eval_time_augment=eval_time_augment,
            visium_raw_scale=visium_raw_scale,
            pos_remap=pos_remap,
        ),
    )


# Protocol constants per dataset (BASELINE.md):
#   HER2ST: 785 HVGs, 32 LOO folds, K=200, L1 distance weights
#   cSCC:   171 HVGs, 12 folds, K=600, L2
#   Visium: 685 HVGs,  9 folds, K=200, L2, eval-time augmentation quirk
#
# pos_vocab: the reference hardcodes nn.Embedding(65536, d) x/y tables
# (model.py:204) because Visium indexes them by RAW PIXEL coordinates; the
# ST datasets index by array coords (dataset.py:195, values < ~70), so rows
# beyond a small prefix are never read by ANY section, train or eval — their
# values (and their dense-Adam decay) cannot affect any output. The ST
# presets therefore keep only a 1024-row table: bit-identical model behavior
# at a tiny fraction of the 2 x 206 MB tables' ~9.6 ms/step optimizer+layout
# traffic (PROFILE_r02). The visium preset can't prefix-slice (raw pixel
# coords span the full range) so it REMAPS observed values to dense rows at
# load time instead (pos_remap, data/posremap.py) — same effect, exact
# per-coordinate semantics. Out-of-range coords raise at load (train/loop.py)
# instead of the reference's silent clamp.
PRESETS = {
    "her2st": _preset("her2st", 785, 32, 200, 1, pos_vocab=1024),
    "cscc": _preset("cscc", 171, 12, 600, 2, pos_vocab=1024),
    "visium": _preset("visium", 685, 9, 200, 2, eval_time_augment=True,
                      visium_raw_scale=True, pos_remap=True),
    "synthetic": Config(
        model=ModelConfig(
            # spot_dim matches data.synthetic.make_dataset's num_genes default
            encoder_name="tiny_cnn", image_dim=128, spot_dim=32, projection_dim=32
        ),
        train=TrainConfig(batch_size=32, max_epochs=2),
        eval=EvalConfig(batch_size=16, top_k=8, weight_ord=1),
        # LOO protocol: num_folds == number of sections (make_dataset default 3).
        # patch_size matches make_dataset's 32px synthetic patches — the CLI
        # falls back here, so `--dataset synthetic` doesn't cut 224px patches
        # through the tiny tower (49x the pixels for zero extra coverage).
        data=DataConfig(dataset="synthetic", num_folds=3, patch_size=32),
    ),
}


def get_config(name: str) -> Config:
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; have {sorted(PRESETS)}")
    return PRESETS[name]


def reference_data_root() -> Optional[str]:
    """Root of the reference checkout, when mounted (for shipped gene panels)."""
    for cand in (os.environ.get("MCLSTEXP_REFERENCE_DATA"), "/root/reference/data"):
        if cand and os.path.isdir(cand):
            return cand
    return None
