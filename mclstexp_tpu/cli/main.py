"""Command-line interface: hvg / train / eval / predict / bench.

Replaces the reference's three script pairs and their argparse blocks
(reference ``train.py``, ``evel_*.py``, ``hvg_*.py``) with dataset-preset
subcommands over one config tree:

  python -m mclstexp_tpu.cli hvg     --dataset her2st --data-root ... --out ...
  python -m mclstexp_tpu.cli train   --dataset her2st --data-root ... [--fold N]
  python -m mclstexp_tpu.cli eval    --dataset her2st --data-root ...
  python -m mclstexp_tpu.cli predict --dataset her2st --checkpoint ... --fold N
  python -m mclstexp_tpu.cli bench

Every reference CLI knob (batch size, epochs, temperature, dims, heads,
encoder name — ``train.py:13-26``) is exposed with the same defaults.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
from typing import List, Optional

import numpy as np


def _add_model_flags(p: argparse.ArgumentParser):
    # reference train.py:13-26 flags, same names. Flags whose value the
    # dataset PRESET may override (config.PRESETS — notably synthetic's
    # tiny_cnn/32-dim model) default to None = "preset default"; for the
    # real datasets the presets inherit the ModelConfig/TrainConfig
    # defaults, which equal the reference's argparse defaults, so an unset
    # flag still means the reference value there. (Before this fallback the
    # CLI defaults silently clobbered the synthetic preset and `--dataset
    # synthetic` trained DenseNet121 on 224px patches.)
    p.add_argument("--batch_size", type=int, default=None,
                   help="default: preset (reference 128)")
    p.add_argument("--max_epochs", type=int, default=None,
                   help="default: preset (reference 90); baselines: "
                        "per-family reference epochs")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--dim", type=int, default=None, help="spot dim (# HVGs); preset default")
    p.add_argument("--image_embedding_dim", type=int, default=None)
    p.add_argument("--projection_dim", type=int, default=None,
                   help="default: preset (reference 256)")
    p.add_argument("--heads_num", type=int, default=8)
    p.add_argument("--heads_dim", type=int, default=64)
    p.add_argument("--heads_layers", type=int, default=2)
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--encoder_name", type=str, default=None,
                   help="default: preset (reference densenet121)")
    p.add_argument("--pretrained", type=str, default="",
                   help="torch .pt with ImageNet-pretrained tower weights "
                        "(torchvision/timm state_dict); training starts from "
                        "them, like the reference default (model.py:73)")
    p.add_argument("--dtype", type=str, default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--debug-nans", action="store_true",
                   help="abort with a located traceback on the first NaN "
                        "inside any jitted step (debug only)")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)


def _add_dist_flags(p: argparse.ArgumentParser):
    # Multi-host launch (the reference's SLURM/DDP analog for BLEEP,
    # BLEEP_main.py:112-124; here it is jax.distributed over the TPU slice).
    # All three optional: on TPU pods the coordinator is discovered from the
    # environment, and single-host runs skip initialization entirely.
    p.add_argument("--coordinator", type=str, default="",
                   help="coordinator address host:port for jax.distributed "
                        "(omit on TPU pods — auto-discovered)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)


def _add_data_flags(p: argparse.ArgumentParser):
    p.add_argument("--dataset", type=str, default="her2st",
                   choices=["her2st", "cscc", "visium", "synthetic"])
    p.add_argument("--data-root", type=str, default="",
                   help="root of the raw dataset files")
    p.add_argument("--gene-panel", type=str, default="",
                   help="path to HVG panel (.npy/.pkl); defaults to the shipped panel")
    p.add_argument("--preprocessed-root", type=str,
                   default="data/preprocessed_expression_matrices")
    p.add_argument("--patch-cache", type=str, default="patch_cache")
    p.add_argument("--patch-size", type=int, default=None,
                   help="default: preset (224 for the contrastive model); "
                        "pass 112 for the slide baselines")
    p.add_argument("--no-pos-remap", action="store_true",
                   help="disable the dense coordinate remap even where the "
                        "preset enables it (visium) — needed to load "
                        "checkpoints trained with the reference's full "
                        "65536-row positional tables")
    p.add_argument("--checkpoint-dir", type=str, default="model_result")


def _build_config(args) -> "Config":
    from mclstexp_tpu.config import ENCODER_DIMS, get_config

    cfg = get_config(args.dataset)
    encoder = args.encoder_name or cfg.model.encoder_name
    model = dataclasses.replace(
        cfg.model,
        encoder_name=encoder,
        image_dim=args.image_embedding_dim
        or (ENCODER_DIMS[encoder] if args.encoder_name else cfg.model.image_dim),
        spot_dim=args.dim or cfg.model.spot_dim,
        projection_dim=args.projection_dim or cfg.model.projection_dim,
        heads_num=args.heads_num,
        heads_dim=args.heads_dim,
        head_layers=args.heads_layers,
        dropout=args.dropout,
        temperature=args.temperature,
        dtype=args.dtype,
        pretrained_path=args.pretrained or None,
    )
    train = dataclasses.replace(
        cfg.train,
        batch_size=args.batch_size or cfg.train.batch_size,
        max_epochs=(args.max_epochs
                    if args.max_epochs is not None else cfg.train.max_epochs),
        lr=args.lr if args.lr is not None else cfg.train.lr,
        weight_decay=args.weight_decay,
        seed=args.seed,
        checkpoint_dir=args.checkpoint_dir,
        debug_nans=getattr(args, "debug_nans", False),
    )
    data = dataclasses.replace(
        cfg.data,
        data_root=args.data_root,
        gene_panel=args.gene_panel,
        preprocessed_root=getattr(args, "preprocessed_root", cfg.data.preprocessed_root),
        patch_cache_dir=args.patch_cache,
        patch_size=getattr(args, "patch_size", None) or cfg.data.patch_size,
        pos_remap=(cfg.data.pos_remap
                   and not getattr(args, "no_pos_remap", False)),
    )
    return dataclasses.replace(cfg, model=model, train=train, data=data)


def _load_sections(cfg, with_patches: bool = True):
    from mclstexp_tpu.data import genes, synthetic
    from mclstexp_tpu.data.st_dataset import (
        cscc_section_names,
        her2st_section_names,
        load_cscc,
        load_her2st,
    )
    from mclstexp_tpu.data.visium import VISIUM_SECTIONS, load_visium

    ds = cfg.data.dataset
    if ds == "synthetic":
        # honor --patch-size: the model towers are built for
        # cfg.data.patch_size, and a fixed 32px default here would feed
        # them mismatched patches (Hist2ST's conv patchify then fails its
        # token reshape)
        return synthetic.make_dataset(patch_size=cfg.data.patch_size)
    panel = genes.load_panel(ds, cfg.data.gene_panel or None)
    ps = cfg.data.patch_size
    # cache dir is per (dataset, patch size): the flagship cuts 224px, the
    # slide baselines 112px, and a shared dir would re-cut on every switch
    # (the loaders treat a wrong-size cache as a miss)
    cache = os.path.join(cfg.data.patch_cache_dir, f"{ds}_{ps}")

    def load(names=None, with_p=with_patches):
        if ds == "her2st":
            return load_her2st(cfg.data.data_root, panel, names=names,
                               patch_size=ps, cache_dir=cache,
                               with_patches=with_p)
        if ds == "cscc":
            return load_cscc(cfg.data.data_root, panel, names=names,
                             patch_size=ps, cache_dir=cache,
                             with_patches=with_p)
        if ds == "visium":
            kw = {} if names is None else {"names": names}
            return load_visium(cfg.data.data_root, cfg.data.preprocessed_root,
                               patch_size=ps, cache_dir=cache,
                               with_patches=with_p, **kw)
        raise ValueError(ds)

    if with_patches:
        import jax

        if jax.process_count() > 1:
            # Cooperative patch-cache pre-cut: each host cuts only its shard
            # of sections (the DistributedSampler-style split,
            # BLEEP_main.py:57), then all hosts barrier before reading the
            # full cache set. Requires the cache dir on shared storage.
            from mclstexp_tpu.parallel.distributed import process_shard, sync_hosts

            if ds == "her2st":
                all_names = her2st_section_names(cfg.data.data_root)
            elif ds == "cscc":
                all_names = cscc_section_names()
            else:
                all_names = list(VISIUM_SECTIONS)
            load(names=all_names[process_shard(len(all_names))])
            sync_hosts("patch-cache-precut")
    return load()


def _maybe_remap(cfg, sections, prefer_saved: bool = False):
    """Apply the dense coordinate remap when the preset asks for it.

    Visium feeds RAW PIXEL coords to the positional tables (reference
    ``dataset.py:316-341``, hence its 65536-row ``nn.Embedding``s,
    ``model.py:204-205``); ``DataConfig.pos_remap`` rewrites them to dense
    row ids over the observed values and shrinks ``ModelConfig.pos_vocab``
    to match — exact per-coordinate semantics (data/posremap.py). Returns
    (cfg, sections, remap-or-None).

    ``prefer_saved``: checkpoint-consuming commands (eval/predict/serve,
    and train --resume) load the ``pos_remap.npz`` persisted at train time
    when it exists — the mapping DEFINES the checkpoint's table row
    assignment, and rebuilding it from the currently loaded sections would
    silently permute every row if the on-disk dataset drifted (a section
    added/removed can keep the 128-aligned vocab identical while shifting
    the searchsorted ids). Coordinates the saved remap never observed
    raise in ``apply`` instead of aliasing a trained row. Fresh training
    builds the mapping over ALL loaded sections and persists it."""
    if not cfg.data.pos_remap:
        return cfg, sections, None
    from mclstexp_tpu.data.posremap import PosRemap

    saved = os.path.join(cfg.train.checkpoint_dir, cfg.data.dataset,
                         "pos_remap.npz")
    if prefer_saved and os.path.exists(saved):
        remap = PosRemap.load(saved)
    else:
        remap = PosRemap.build(sections)
    sections = remap.apply_sections(sections)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, pos_vocab=remap.vocab)
    )
    return cfg, sections, remap


def _visium_matrix_dirs(cfg) -> dict:
    from mclstexp_tpu.data.visium import VISIUM_SECTIONS, VISIUM_SECTIONS_ALEX

    matrix_dirs = {}
    for name in VISIUM_SECTIONS:
        sub = (
            "filtered_count_matrix"
            if name in VISIUM_SECTIONS_ALEX
            else "filtered_feature_bc_matrix"
        )
        matrix_dirs[name] = os.path.join(cfg.data.data_root, name, sub)
    return matrix_dirs


def cmd_hvg(args) -> int:
    """Build per-section preprocessed expression matrices (and optionally a
    fresh HVG panel) — the reference ``hvg_*.py`` pipeline."""
    cfg = _build_config(args)
    if args.select_panel:
        # Emit the panel artifacts themselves (per-section HVG masks,
        # union/intersection pickles, and the cut panel .npy) — the part of
        # reference hvg_her2st.py:24-57 that ONBOARDS a new dataset with no
        # shipped panel. The produced .npy feeds straight into --gene-panel.
        from mclstexp_tpu.data import panel as panel_mod

        if cfg.data.dataset == "visium":
            frames = panel_mod.visium_count_frames(_visium_matrix_dirs(cfg))
        else:
            frames = panel_mod.count_frames_for_dataset(
                cfg.data.dataset, cfg.data.data_root
            )
        sel = panel_mod.select_panel(
            frames,
            n_top_genes=args.n_top_genes,
            min_sections=args.panel_min_sections,
            panel_size=args.panel_size,
        )
        out_dir = args.out or os.path.join(
            cfg.data.preprocessed_root, f"{cfg.data.dataset}_panel"
        )
        path = panel_mod.save_panel_artifacts(sel, out_dir, cfg.data.dataset)
        print(
            f"panel: {len(sel.panel)} genes -> {path} "
            f"(union {int(sel.union.sum())}, "
            f"intersection {int(sel.intersection.sum())}, "
            f"{len(sel.shared_genes)} shared genes, "
            f"{len(sel.section_names)} sections)"
        )
        return 0
    if cfg.data.dataset == "visium":
        # Visium flows raw 10x counts -> gene x spot matrices (its own quirky
        # orientation, see data/visium.py); sections can't be loaded first.
        from mclstexp_tpu.data import genes
        from mclstexp_tpu.data.visium import build_visium_preprocessed

        panel = genes.load_panel("visium", cfg.data.gene_panel or None)
        matrix_dirs = _visium_matrix_dirs(cfg)
        out_root = args.out or cfg.data.preprocessed_root
        build_visium_preprocessed(matrix_dirs, out_root, panel)
        print(f"wrote {len(matrix_dirs)} matrices under {out_root}")
        return 0
    sections = _load_sections(cfg, with_patches=False)
    out_root = os.path.join(args.out or cfg.data.preprocessed_root, cfg.data.dataset)
    for s in sections:
        d = os.path.join(out_root, s.name)
        os.makedirs(d, exist_ok=True)
        # reference layout AND normalization: genes x spots, per-GENE
        # library-size normalized (hvg_her2st.py:108,116-125 transposes
        # before scprep's row-normalizer; see normalize.pergene_logcpm).
        # Divergence: the reference pools ALL cnts-TSV spots, which can
        # exceed the spotfile-joined spot set its own eval embeds — here the
        # matrix covers exactly the joined spots so phase B can't misalign.
        np.save(os.path.join(d, "preprocessed_matrix.npy"), s.eval_expression.T)
        print(f"{s.name}: {s.eval_expression.T.shape} -> {d}/preprocessed_matrix.npy")
    return 0


def cmd_train(args) -> int:
    cfg = _build_config(args)
    from mclstexp_tpu.train.loop import train_all_folds, train_fold
    from mclstexp_tpu.utils.logging import MetricLogger

    sections = _load_sections(cfg)
    cfg, sections, remap = _maybe_remap(
        cfg, sections, prefer_saved=getattr(args, "resume", False))
    if remap is not None:
        # Persisted as the authoritative row assignment: eval/predict/serve
        # and export-torch load THIS file rather than rebuilding from the
        # (possibly drifted) dataset — see _maybe_remap.
        d = os.path.join(cfg.train.checkpoint_dir, cfg.data.dataset)
        os.makedirs(d, exist_ok=True)
        remap.save(os.path.join(d, "pos_remap.npz"))
    logger = MetricLogger(path=os.path.join(cfg.train.checkpoint_dir, "train_log.jsonl"))
    if args.fold is not None:
        train_fold(cfg, sections, args.fold, logger=logger, resume=args.resume)
    else:
        train_all_folds(cfg, sections, logger=logger)
    return 0


def _print_averages(avg) -> None:
    # the reference's four printed averages (evel_her2st.py:223-226)
    print(f"avg heg pcc: {avg['heg_pcc']:.4f}")
    print(f"avg hvg pcc: {avg['hvg_pcc']:.4f}")
    print(f"Mean Squared Error (MSE): {avg['mse']:.4f}")
    print(f"Mean Absolute Error (MAE): {avg['mae']:.4f}")


def _preprocessed_section_names(cfg, root: str) -> List[str]:
    """Section order for --from-embeddings ground truth.

    Derived from the dataset protocol where it defines one (cscc's fixed
    patient x replicate grid, visium's fixed section tuple, her2st's
    ``[1:33]`` ST-cnts listing) rather than a raw sorted listdir, so a stray
    directory under the preprocessed root can't silently misalign fold
    indices against the embedding dumps (ADVICE r2 #2). Falls back to the
    sorted listing for synthetic/unknown layouts; either way
    ``evaluate_from_embedding_dumps`` hard-fails on per-section spot-count
    mismatches."""
    listing = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    ds = cfg.data.dataset
    if ds == "cscc":
        from mclstexp_tpu.data.st_dataset import cscc_section_names

        names = cscc_section_names()
    elif ds == "visium":
        from mclstexp_tpu.data.visium import VISIUM_SECTIONS

        names = list(VISIUM_SECTIONS)
    elif ds == "her2st" and cfg.data.data_root:
        from mclstexp_tpu.data.st_dataset import her2st_section_names

        names = her2st_section_names(cfg.data.data_root)
    else:
        return listing
    missing = [n for n in names if n not in listing]
    if missing:
        raise FileNotFoundError(
            f"preprocessed matrices missing for sections {missing} under {root}"
        )
    return names


def cmd_eval(args) -> int:
    """Full LOO protocol: per-fold embedding dump + retrieval metrics
    (the reference ``evel_*.py`` flow), printing the same four averages."""
    cfg = _build_config(args)
    from mclstexp_tpu.data.pipeline import ConcatSections
    from mclstexp_tpu.infer import embed, evaluate
    from mclstexp_tpu.train import checkpoint as ckpt
    from mclstexp_tpu.train.state import create_train_state

    if args.from_embeddings:
        if getattr(args, "device_metrics", False):
            print("--device-metrics applies to the checkpoint eval path; "
                  "--from-embeddings scores host dumps with the fp64 "
                  "bundle (flag ignored)", file=sys.stderr)
        # Score pre-computed embedding dumps (reference phase B,
        # evel_her2st.py:143-226) — no raw data, model, or checkpoint needed.
        # Ground truth comes from the preprocessed gene x spot matrices, the
        # same files the reference's phase B reads (evel_her2st.py:136).
        root = os.path.join(cfg.data.preprocessed_root, cfg.data.dataset)
        names = _preprocessed_section_names(cfg, root)
        expressions = [
            np.load(os.path.join(root, nm, "preprocessed_matrix.npy"))
            .T.astype(np.float32)
            for nm in names
        ]
        results = evaluate.evaluate_from_embedding_dumps(
            args.from_embeddings,
            expressions,
            top_k=cfg.eval.top_k,
            weight_ord=cfg.eval.weight_ord,
            folds=[args.fold] if args.fold is not None else None,
            prediction_dir=cfg.eval.prediction_dir,
            section_names=names,
        )
        _print_averages(results["avg"])
        if args.json:
            with open(args.json, "w") as f:
                json.dump(results, f, indent=2)
        return 0

    sections = _load_sections(cfg)
    cfg, sections, remap = _maybe_remap(cfg, sections, prefer_saved=True)
    from mclstexp_tpu.train.loop import check_positions_in_vocab

    check_positions_in_vocab(sections, cfg.model.pos_vocab)
    sizes = [s.num_spots for s in sections]
    # Phase-B keys and ground truth use the eval normalization (per-gene,
    # the hvg scripts' matrices — evel_her2st.py:136-171); the model still
    # embeds the train-normalized expression (Section.eval_expression doc).
    expressions = [s.eval_expression for s in sections]

    data = ConcatSections.from_sections(sections[:1])
    b = data.take(np.arange(min(8, sizes[0])))
    sample = {
        "image": b["image_u8"].astype(np.float32) / 255.0,
        "expression": b["expression"],
        "position": b["position"],
    }
    model, state0 = create_train_state(cfg.model, cfg.train, sample)

    folds = [args.fold] if args.fold is not None else list(range(len(sections)))
    prepared = embed.prepare_eval_arrays(sections)  # one H2D for all folds
    bounds = evaluate.section_bounds(sizes)
    # Ground-truth key expressions live in HBM ONCE for every fold; per-fold
    # key sets are the full device arrays with the held-out section masked
    # (evaluate_fold_resident) — no per-fold host concat + re-upload.
    expr_full_dev = prepared["eval_expression"]
    per_fold = []
    for fold in folds:
        if args.torch_checkpoint:
            # score a reference-trained torch .pt directly (key shims +
            # tensor conversion; evel_her2st.py:32-39's load path)
            from mclstexp_tpu.models.image.torch_import import load_into_state

            pt = args.torch_checkpoint.format(fold=fold, name=sections[fold].name)
            state = load_into_state(state0, pt, cfg.model, pos_remap=remap)
        else:
            ckpt_dir = ckpt.fold_checkpoint_dir(
                cfg.train.checkpoint_dir, cfg.data.dataset, sections[fold].name, fold
            )
            restored = ckpt.restore_checkpoint(ckpt_dir)
            state = ckpt.apply_checkpoint(state0, restored)
        if args.shard_eval and not cfg.data.eval_time_augment:
            import jax

            from mclstexp_tpu.parallel.mesh import make_mesh

            mesh = make_mesh((len(jax.devices()),), ("data",))
            img, spot = embed.compute_embeddings_sharded(
                model, state.params, state.batch_stats, sections, mesh,
                cfg.eval.batch_size, raw_scale=cfg.data.visium_raw_scale,
                prepared=prepared,
            )
        else:
            img, spot = embed.compute_embeddings(
                model, state.params, state.batch_stats, sections, cfg.eval.batch_size,
                eval_augment=cfg.data.eval_time_augment, prepared=prepared,
                raw_scale=cfg.data.visium_raw_scale, as_device=True,
            )
        if args.save_embeddings:
            out_dir = os.path.join(cfg.eval.embedding_dir,
                                   f"{cfg.data.dataset}_result", f"embeddings_{fold}")
            embed.save_embedding_files(img, spot, sizes, out_dir)
        pred_path = None
        # prediction dumps only for the full protocol (matches the previous
        # evaluate_folds behavior; single-fold dumps go through `predict`)
        if cfg.eval.prediction_dir and len(folds) == len(sections):
            pred_path = os.path.join(
                cfg.eval.prediction_dir, sections[fold].name,
                "matched_spot_expression_pred.npy",
            )
        per_fold.append(evaluate.evaluate_fold_resident(
            fold, img, spot, expr_full_dev, bounds, expressions[fold],
            top_k=cfg.eval.top_k, weight_ord=cfg.eval.weight_ord,
            prediction_path=pred_path,
            device_metrics=getattr(args, "device_metrics", False),
        ))

    results = {
        "per_fold": per_fold,
        "folds": folds,
        "avg": {
            k: float(np.mean([m[k] for m in per_fold])) for k in per_fold[0]
        },
    }
    _print_averages(results["avg"])
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
    return 0


def cmd_predict(args) -> int:
    """Predict expression for one held-out section from a checkpoint."""
    cfg = _build_config(args)
    from mclstexp_tpu.data.pipeline import ConcatSections
    from mclstexp_tpu.infer import embed, evaluate
    from mclstexp_tpu.train import checkpoint as ckpt
    from mclstexp_tpu.train.state import create_train_state

    sections = _load_sections(cfg)
    cfg, sections, _ = _maybe_remap(cfg, sections, prefer_saved=True)
    fold = args.fold
    data = ConcatSections.from_sections(sections[:1])
    b = data.take(np.arange(8))
    sample = {
        "image": b["image_u8"].astype(np.float32) / 255.0,
        "expression": b["expression"],
        "position": b["position"],
    }
    model, state0 = create_train_state(cfg.model, cfg.train, sample)
    restored = ckpt.restore_checkpoint(args.checkpoint)
    state = ckpt.apply_checkpoint(state0, restored)

    img, spot = embed.compute_embeddings(
        model, state.params, state.batch_stats, sections, cfg.eval.batch_size,
        eval_augment=cfg.data.eval_time_augment,
        raw_scale=cfg.data.visium_raw_scale,
    )
    sizes = [s.num_spots for s in sections]
    out = evaluate.evaluate_fold(
        fold,
        embed.split_by_section(img, sizes)[fold],
        embed.split_by_section(spot, sizes),
        [s.eval_expression for s in sections],  # phase-B normalization
        top_k=cfg.eval.top_k,
        weight_ord=cfg.eval.weight_ord,
        prediction_path=args.out,
    )
    print(json.dumps(out, indent=2))
    return 0


def cmd_serve(args) -> int:
    """Serve patch -> predicted-expression over HTTP from one checkpoint.

    The deployment path the reference lacks (its inference is a per-dataset
    batch script, ``evel_her2st.py:120-226``): the spot database — every
    loaded section's embeddings + expression profiles — is built once,
    stays HBM-resident, and each POST /predict runs the image tower at
    bucket-padded static shapes plus the fused top-K retrieval
    (infer/serve.py). ``--exclude-fold`` masks one section out of
    retrieval AFTER embedding all sections together — exactly the LOO
    protocol's held-out key set (infer/evaluate.py embeds the full
    concatenation, then key-masks; dropping the section first would shift
    B=32 batch-as-sequence boundaries and change the remaining keys'
    embeddings, reference ``evel_her2st.py:66-69``).

    Deliberate divergence: the visium preset's eval-time random
    augmentation (``eval_time_augment``, reference ``dataset.py:316-325``)
    is NOT applied to query patches — a server must answer the same patch
    with the same prediction (see infer/serve.py module docstring)."""
    cfg = _build_config(args)
    from mclstexp_tpu.infer.serve import PredictionService, make_server
    from mclstexp_tpu.train import checkpoint as ckpt
    from mclstexp_tpu.train.state import create_train_state

    # The database is spot-tower only; query patches arrive over HTTP, so
    # the (multi-GB at her2st scale) patch caches never load or upload.
    sections = _load_sections(cfg, with_patches=False)
    cfg, sections, _ = _maybe_remap(cfg, sections, prefer_saved=True)
    ps = cfg.data.patch_size
    sample = {
        "image": np.zeros((1, ps, ps, 3), np.float32),
        "expression": sections[0].expression[:1],
        "position": sections[0].positions[:1],
    }
    model, state0 = create_train_state(cfg.model, cfg.train, sample)
    restored = ckpt.restore_checkpoint(args.checkpoint)
    state = ckpt.apply_checkpoint(state0, restored)

    gene_names = None
    if cfg.data.dataset != "synthetic":
        from mclstexp_tpu.data import genes

        gene_names = [str(g) for g in
                      genes.load_panel(cfg.data.dataset, cfg.data.gene_panel or None)]
    service = PredictionService.from_sections(
        model, state.params, state.batch_stats, sections,
        batch_size=cfg.eval.batch_size, exclude_section=args.exclude_fold,
        top_k=cfg.eval.top_k,
        weight_ord=cfg.eval.weight_ord, raw_scale=cfg.data.visium_raw_scale,
        max_batch=args.max_batch, gene_names=gene_names,
        patch_size=cfg.data.patch_size,
    )
    server = make_server(service, host=args.host, port=args.port)
    host, port = server.server_address[:2]
    print(json.dumps({"serving": f"http://{host}:{port}", **service.info()}))
    try:
        server.serve_forever()
    except KeyboardInterrupt:  # pragma: no cover
        server.shutdown()
    return 0


def cmd_baseline(args) -> int:
    """Train + evaluate one baseline family on one fold (the comparison
    harness the reference vendors under ``baselines/``).

    Checkpointing mirrors the reference's Lightning ``save_checkpoint`` /
    ``load_from_checkpoint`` flow (HisToGene tutorial cell 3,
    ``HIST2ST_train.py:98``): training saves to ``--checkpoint-dir``'s
    ``baselines/<family>/best_<fold>`` unless ``--no-save``;
    ``--load-checkpoint`` skips training and evaluates the restored state.
    ``--super-resolution`` additionally predicts the held-out section on
    the dense 56-px grid (reference ``HisToGene/predict.py:46-68``).
    """
    from mclstexp_tpu.baselines.trainer import (
        BaselineConfig,
        evaluate_baseline_fold,
        init_baseline,
        train_baseline_fold,
        train_bleep_fold,
    )
    from mclstexp_tpu.data.pipeline import split_fold
    from mclstexp_tpu.train import checkpoint as ckpt
    from mclstexp_tpu.utils.logging import MetricLogger

    cfg = _build_config(args)
    sections = _load_sections(cfg)
    n_genes = sections[0].num_genes
    # THItoGene's reference flow deepens the ViT for cSCC
    # (THItoGene/train.py:19-23: n_layers 4 her2st / 8 skin)
    n_layers = args.n_layers
    if n_layers is None and args.baseline == "thitogene" and cfg.data.dataset == "cscc":
        n_layers = 8
    bcfg = BaselineConfig(
        model=args.baseline,
        n_genes=n_genes,
        patch_size=cfg.data.patch_size,
        max_epochs=args.max_epochs,
        n_layers=n_layers,
        lr=args.lr,
        # the baseline subparser resets these defaults to None sentinels so
        # an UNSET flag falls through to the per-family reference default
        # (they were silently ignored before — round-4 review finding)
        weight_decay=args.weight_decay,
        dropout=args.dropout if args.dropout is not None else 0.2,
        temperature=args.temperature if args.temperature is not None else 1.0,
        seed=args.seed,
        zinb_coef=args.zinb,
        bake=args.bake,
        lamb=args.lamb,
        # None (unset) keeps the BLEEP reference batch (BaselineConfig 128);
        # max_epochs likewise falls through to the per-family epochs above
        batch_size=args.batch_size or BaselineConfig.batch_size,
        dtype=args.dtype,
        encoder_name=args.bleep_encoder,
    )
    logger = MetricLogger()
    mesh = None
    if args.dp:
        import jax

        from mclstexp_tpu.parallel.mesh import make_mesh

        mesh = make_mesh((len(jax.devices()),), ("data",))

    if args.torch_checkpoint:
        # score a reference-trained torch/Lightning checkpoint without
        # retraining (interop symmetry with the flagship's eval
        # --torch-checkpoint); dims must match the reference constructors —
        # the importer raises on any unconsumed/missing tensor
        from mclstexp_tpu.baselines.torch_import import (
            load_baseline_torch_checkpoint,
        )

        train_secs, _ = split_fold(sections, args.fold)
        steps = len(train_secs) if args.baseline != "bleep" else 1
        model, state0 = init_baseline(bcfg, train_secs[0], steps_per_epoch=steps)
        params, batch_stats = load_baseline_torch_checkpoint(
            args.torch_checkpoint, args.baseline, model
        )
        state = state0.replace(
            params=params, batch_stats=batch_stats or state0.batch_stats
        )
    elif args.load_checkpoint:
        train_secs, _ = split_fold(sections, args.fold)
        steps = len(train_secs) if args.baseline != "bleep" else 1
        model, state0 = init_baseline(bcfg, train_secs[0], steps_per_epoch=steps)
        state = ckpt.apply_checkpoint(
            state0, ckpt.restore_checkpoint(args.load_checkpoint)
        )
    elif args.baseline == "bleep":
        model, state = train_bleep_fold(
            bcfg, sections, args.fold, logger=logger, mesh=mesh
        )
    else:
        model, state = train_baseline_fold(
            bcfg, sections, args.fold, logger=logger, mesh=mesh
        )

    if not args.load_checkpoint and not args.torch_checkpoint and not args.no_save:
        out_dir = os.path.join(
            cfg.train.checkpoint_dir, "baselines", args.baseline,
            f"best_{args.fold}",
        )
        ckpt.save_checkpoint(out_dir, state)
        print(f"checkpoint: {out_dir}", file=sys.stderr)

    if args.baseline == "bleep":
        from mclstexp_tpu.baselines.trainer import bleep_embeddings
        from mclstexp_tpu.infer import embed, evaluate

        img, spot = bleep_embeddings(model, state, sections)
        sizes = [s.num_spots for s in sections]
        # the reference notebook's three modes (BLEEP_inference.ipynb cell 5)
        top_k, weight_ord = {
            "simple": (1, 0),           # nearest match only
            "average": (50, 0),         # uniform top-50
            "weighted": (50, -1),       # exp(-(d^2 - d_top^2 + 1)) top-50
        }[args.bleep_retrieval]
        result = evaluate.evaluate_fold(
            args.fold,
            embed.split_by_section(img, sizes)[args.fold],
            embed.split_by_section(spot, sizes),
            # same phase-B key/GT files as the mclSTExp protocol (the
            # notebook loads the hvg scripts' per-gene matrices)
            [s.eval_expression for s in sections],
            top_k=top_k,
            weight_ord=weight_ord,
        )
    else:
        result = evaluate_baseline_fold(bcfg, sections, args.fold, model, state)
        if args.super_resolution:
            result["super_resolution"] = _baseline_super_resolution(
                args, cfg, bcfg, model, state, sections
            )
    print(json.dumps(result, indent=2))
    return 0


def _baseline_super_resolution(args, cfg, bcfg, model, state, sections) -> dict:
    """Dense-grid prediction of the held-out section (HisToGene SR mode,
    reference ``predict.py:46-68``); writes (predictions, centers) npz."""
    from mclstexp_tpu.baselines.super_resolution import sr_predict
    from mclstexp_tpu.data.st_dataset import _load_slide, her2st_slide_path

    if cfg.data.dataset != "her2st":
        raise SystemExit("--super-resolution needs --dataset her2st "
                         "(the reference SR tutorial's dataset)")
    section = sections[args.fold]
    slide = _load_slide(her2st_slide_path(cfg.data.data_root, section.name))
    preds, centers = sr_predict(model, state, section, slide, bcfg)
    out = args.super_resolution
    np.savez(out, predictions=preds, centers=centers)
    return {"path": out, "grid_spots": int(len(centers))}


def _find_saved_remap(checkpoint_path: str) -> Optional[str]:
    """Walk up from a fold checkpoint dir (…/<dataset>/<section>/best_<fold>)
    looking for the pos_remap.npz `train` persisted at …/<dataset>/."""
    d = os.path.abspath(checkpoint_path)
    for _ in range(4):
        cand = os.path.join(d, "pos_remap.npz")
        if os.path.exists(cand):
            return cand
        d = os.path.dirname(d)
    return None


def cmd_export_torch(args) -> int:
    """Export an Orbax checkpoint to the reference's torch .pt layout.

    The reverse of ``eval --torch-checkpoint``: a model trained HERE becomes
    a ``state_dict`` the reference's own eval scripts and tutorial load
    unchanged (``evel_her2st.py:32-39``) — verified bit-exact by re-import
    before the file is written (models/image/torch_export.py).
    """
    cfg = _build_config(args)
    if args.variant != "attention":
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, variant=args.variant)
        )
    from mclstexp_tpu.models.image.torch_export import save_reference_checkpoint
    from mclstexp_tpu.train import checkpoint as ckpt

    remap = None
    if args.pos_remap:
        from mclstexp_tpu.data.posremap import PosRemap

        remap = PosRemap.load(args.pos_remap)
    elif cfg.data.pos_remap:
        # A pos_remap-trained checkpoint (the visium preset default) holds
        # compact DENSE-ROW tables; exporting them without the remap would
        # place those rows at raw-coordinate positions 0..vocab-1 — a .pt
        # that loads cleanly into the reference but reads zeros for every
        # real pixel coordinate. Find the pos_remap.npz `train` persisted
        # next to the checkpoint tree, or refuse.
        from mclstexp_tpu.data.posremap import PosRemap

        cand = _find_saved_remap(args.checkpoint)
        if cand is not None:
            remap = PosRemap.load(cand)
            print(f"using coordinate remap: {cand}")
        else:
            raise SystemExit(
                "this preset trains with pos_remap (compact dense-row "
                "positional tables); exporting without the mapping would "
                "write a silently-corrupt reference .pt. Pass --pos-remap "
                "<pos_remap.npz> (written by `train` under "
                "<checkpoint-dir>/<dataset>/), or --no-pos-remap if the "
                "checkpoint was trained with full 65536-row tables."
            )
    restored = ckpt.restore_checkpoint(args.checkpoint)
    path = save_reference_checkpoint(
        args.out,
        restored["params"],
        restored.get("batch_stats", {}) or {},
        cfg.model,
        pos_rows=args.pos_rows,
        pos_remap=remap,
    )
    print(f"wrote reference-layout state_dict: {path}")
    return 0


def cmd_bench(args) -> int:
    import subprocess

    return subprocess.call([sys.executable, os.path.join(os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "bench.py")])


def cmd_fetch(args) -> int:
    """Acquire a dataset (reference ``data/download.sh:1`` equivalent) and
    print the hvg/train commands to run next — see docs/MIGRATION.md."""
    from mclstexp_tpu.data.fetch import fetch

    return fetch(args.dataset, args.dest, dry_run=args.dry_run)


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(prog="mclstexp_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("hvg", help="build preprocessed expression matrices")
    _add_model_flags(p); _add_data_flags(p); _add_dist_flags(p)
    p.add_argument("--out", type=str, default="")
    p.add_argument("--select-panel", action="store_true",
                   help="emit panel artifacts (per-section HVG masks, "
                        "union/intersection pickles, panel .npy for "
                        "--gene-panel) instead of preprocessed matrices — "
                        "onboards a new dataset with no shipped panel")
    p.add_argument("--n-top-genes", type=int, default=1000,
                   help="HVGs per section (reference hvg_*.py n_top_genes)")
    p.add_argument("--panel-min-sections", type=int, default=1,
                   help="keep genes selected by >= this many sections "
                        "(1 == union)")
    p.add_argument("--panel-size", type=int, default=None,
                   help="truncate the panel to this many genes (ranked by "
                        "selection frequency, then mean dispersion)")
    p.set_defaults(fn=cmd_hvg)

    p = sub.add_parser("train", help="train folds (leave-one-section-out)")
    _add_model_flags(p); _add_data_flags(p); _add_dist_flags(p)
    p.add_argument("--fold", type=int, default=None, help="single fold; default all")
    p.add_argument("--resume", action="store_true")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("eval", help="LOO retrieval evaluation")
    _add_model_flags(p); _add_data_flags(p); _add_dist_flags(p)
    p.add_argument("--fold", type=int, default=None)
    p.add_argument("--save-embeddings", action="store_true")
    p.add_argument("--shard-eval", action="store_true",
                   help="distribute the B=32 embedding sweep over all local "
                        "devices (per-batch outputs identical to 1-device; "
                        "ignored when the Visium eval-augment quirk is on)")
    p.add_argument("--from-embeddings", type=str, default="",
                   help="score pre-computed embedding dumps under this root "
                        "(per-fold embeddings_<fold>/ dirs in the reference "
                        "layout); skips model + checkpoint entirely")
    p.add_argument("--torch-checkpoint", type=str, default="",
                   help="reference .pt template, e.g. "
                        "'model_result/her2st/{name}/best_{fold}.pt'; scores "
                        "reference-trained checkpoints without retraining")
    p.add_argument("--json", type=str, default="", help="write full results JSON")
    p.add_argument("--device-metrics", action="store_true",
                   help="compute the per-fold metric bundle on-device (fp32, "
                        "one 4-scalar readback per fold instead of the full "
                        "prediction matrix; rtol 3e-5 vs the fp64 default)")
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("predict", help="predict expression for one section")
    _add_model_flags(p); _add_data_flags(p); _add_dist_flags(p)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--fold", type=int, required=True)
    p.add_argument("--out", type=str, default="")
    p.set_defaults(fn=cmd_predict)

    p = sub.add_parser("baseline", help="train/eval a baseline family")
    _add_model_flags(p); _add_data_flags(p); _add_dist_flags(p)
    # None sentinels: unset flags fall through to each family's reference
    # defaults in BaselineConfig instead of the flagship defaults above
    p.set_defaults(weight_decay=None, dropout=None, temperature=None)
    p.add_argument("--baseline", type=str, required=True,
                   choices=["histogene", "hist2st", "thitogene", "bleep"])
    p.add_argument("--fold", type=int, default=0)
    p.add_argument("--zinb", type=float, default=0.25)
    p.add_argument("--bake", type=int, default=None,
                   help="Hist2ST distillation passes; default = reference's 5")
    p.add_argument("--lamb", type=float, default=0.5)
    p.add_argument("--bleep-encoder", type=str, default="resnet50",
                   choices=["resnet50", "res101", "resnet152", "vit", "vit_l",
                            "clip_vit", "tiny_cnn"],
                   help="BLEEP image tower (reference "
                        "baselines/Bleep/modules.py:7-132 menu)")
    p.add_argument("--dp", action="store_true",
                   help="data-parallel training over all local devices: BLEEP "
                        "keeps its exact global-batch objective; the slide "
                        "families run slide-per-device with mean gradients "
                        "(torch-DDP-at-batch-1 semantics — a scaling mode, "
                        "not the sequential parity trajectory)")
    p.add_argument("--bleep-retrieval", type=str, default="average",
                   choices=["simple", "average", "weighted"],
                   help="BLEEP inference mode (BLEEP_inference.ipynb cell 5): "
                        "nearest match / uniform top-50 / exp-weighted top-50")
    p.add_argument("--no-save", action="store_true",
                   help="skip the end-of-training checkpoint")
    p.add_argument("--load-checkpoint", type=str, default="",
                   help="restore this baseline checkpoint instead of training")
    p.add_argument("--torch-checkpoint", type=str, default="",
                   help="score a reference-trained torch/Lightning baseline "
                        "checkpoint (.pt state_dict or Lightning .ckpt) "
                        "without retraining (baselines/torch_import.py)")
    p.add_argument("--super-resolution", type=str, default="",
                   help="also predict the held-out section on the dense 56-px "
                        "grid (HisToGene SR mode) and write (predictions, "
                        "centers) to this .npz")
    p.add_argument("--n-layers", type=int, default=None,
                   help="slide-ViT depth; default = the family's reference "
                        "flow (HisToGene 8, THItoGene 4/8 by dataset)")
    # let each family resolve its reference flow defaults
    # (trainer._FAMILY_LR/_FAMILY_EPOCHS/_FAMILY_N_LAYERS)
    p.set_defaults(fn=cmd_baseline, lr=None, max_epochs=None)

    p = sub.add_parser("serve", help="HTTP prediction service from a checkpoint")
    _add_model_flags(p); _add_data_flags(p); _add_dist_flags(p)
    p.add_argument("--checkpoint", type=str, required=True,
                   help="Orbax checkpoint directory (a fold's best_<k> dir)")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8777,
                   help="0 binds an ephemeral port (printed on startup)")
    p.add_argument("--max-batch", type=int, default=256,
                   help="largest patch-count bucket compiled for the image "
                        "tower; bigger requests are chunked")
    p.add_argument("--exclude-fold", type=int, default=None,
                   help="drop this section from the retrieval database "
                        "(LOO-held-out semantics)")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("export-torch",
                       help="export an Orbax checkpoint to a reference torch .pt")
    _add_model_flags(p); _add_data_flags(p); _add_dist_flags(p)
    p.add_argument("--checkpoint", type=str, required=True,
                   help="Orbax checkpoint directory (a fold's best_<k> dir)")
    p.add_argument("--out", type=str, required=True, help="output .pt path")
    p.add_argument("--variant", type=str, default="attention",
                   choices=["attention", "mlp"])
    p.add_argument("--pos-rows", type=int, default=65536,
                   help="pad the positional tables back to this many rows "
                        "(the reference's nn.Embedding(65536) layout; ST "
                        "presets train on a sliced prefix)")
    p.add_argument("--pos-remap", type=str, default="",
                   help="pos_remap.npz written by `train` for a pos_remap "
                        "preset (visium): scatter the compact table rows "
                        "back to their raw-coordinate rows")
    p.set_defaults(fn=cmd_export_torch)

    p = sub.add_parser("fetch", help="download a dataset and print next steps")
    p.add_argument("dataset", choices=["her2st", "cscc", "visium"])
    p.add_argument("--dest", type=str, default="./datasets",
                   help="download root (data-root paths are printed after)")
    p.add_argument("--dry-run", action="store_true",
                   help="print the fetch commands without executing")
    p.set_defaults(fn=cmd_fetch)

    p = sub.add_parser("bench", help="run the throughput benchmark")
    p.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    # Multi-host: explicit --coordinator/--num-processes/--process-id, or
    # env-discovered on TPU pods; no-op on single-host runs (incl. tests).
    from mclstexp_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed(
        getattr(args, "coordinator", "") or None,
        getattr(args, "num_processes", None),
        getattr(args, "process_id", None),
    )
    _enable_compilation_cache()
    return args.fn(args)


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache for every CLI invocation (same
    knob bench.py uses). Matters doubly on remote-TPU tunnels, where
    compiles run 60-500 s and the LOO fold loop compiles one
    find_matches/metrics program per distinct section size — cached, a
    repeat `cli eval` skips all of them. MCLSTEXP_JAX_CACHE overrides the
    location; set it empty to disable. A cache dir configured earlier in
    the process wins — the test suite's conftest keys its cache by CPU
    flags + jax build (cross-build AOT reuse computes wrong numbers; see
    tests/conftest.py) and in-process `main()` calls must not clobber it."""
    import jax

    if jax.config.jax_compilation_cache_dir:
        return
    cache_dir = os.environ.get(
        "MCLSTEXP_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "mclstexp_jax"),
    )
    if not cache_dir:
        return
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception as e:  # cache is best-effort
        print(f"compilation cache unavailable: {e}", file=sys.stderr)


if __name__ == "__main__":
    raise SystemExit(main())
