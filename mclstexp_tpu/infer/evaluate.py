"""Leave-one-out retrieval evaluation (the reference's phase B).

Per fold (reference ``evel_her2st.py:143-221``): queries are the held-out
section's image embeddings; the key set is the concatenation of every
*other* section's spot embeddings and expression profiles; prediction is the
1/d^2-weighted average of the top-K retrieved keys' expressions; metrics are
mean gene-wise PCC over the panel (NaN-dropped) and over the top-50 HEGs,
plus MSE/MAE; all averaged over folds.

The retrieval + aggregation math runs fused on-device (ops.retrieval)
instead of the reference's per-spot Python loop.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from mclstexp_tpu.infer.metrics import expression_metrics
from mclstexp_tpu.ops.retrieval import retrieve_and_aggregate


def evaluate_fold(
    fold: int,
    image_embeddings: np.ndarray,  # (N_f, P) — held-out section, fold's model
    spot_embeddings: Sequence[np.ndarray],  # per section (N_i, P), fold's model
    expressions: Sequence[np.ndarray],  # per section (N_i, G), ground truth
    top_k: int,
    weight_ord: int = 1,
    prediction_path: Optional[str] = None,
) -> Dict[str, float]:
    spot_key = np.concatenate(
        [e for i, e in enumerate(spot_embeddings) if i != fold], axis=0
    )
    expression_key = np.concatenate(
        [e for i, e in enumerate(expressions) if i != fold], axis=0
    )
    expression_gt = expressions[fold]

    _, pred_expr = retrieve_and_aggregate(
        spot_key, expression_key, image_embeddings, top_k=top_k, weight_ord=weight_ord
    )
    if prediction_path:
        # dirname('') of a bare filename would crash makedirs
        os.makedirs(os.path.dirname(prediction_path) or ".", exist_ok=True)
        # reference dump layout: genes x spots (evel_her2st.py:189)
        np.save(prediction_path, pred_expr.T)
    return expression_metrics(pred_expr, expression_gt)


def section_bounds(sizes: Sequence[int]) -> List[tuple]:
    """[(start, stop)] of each section inside the concatenated arrays."""
    out, start = [], 0
    for n in sizes:
        out.append((start, start + n))
        start += n
    return out


def evaluate_fold_resident(
    fold: int,
    image_embeddings_full,  # (N_total, P) — device or host, ALL sections
    spot_embeddings_full,  # (N_total, P) — device or host, ALL sections
    expressions_full,  # (N_total, G) — device-resident ground truth
    bounds: Sequence[tuple],  # per-section (start, stop)
    expression_gt: np.ndarray,  # (N_fold, G) host ground truth for metrics
    top_k: int,
    weight_ord: int = 1,
    prediction_path: Optional[str] = None,
    device_metrics: bool = False,
) -> Dict[str, float]:
    """Device-resident form of ``evaluate_fold`` (ADVICE/VERDICT r2: the
    host path re-concatenates 31 sections' embeddings + expressions and
    re-uploads ~40 MB per fold over a slow tunnel). Here the FULL key set
    stays in HBM across folds and the held-out section is excluded by a
    score mask instead of re-concatenation — identical retrieval (masked
    rows can never enter the top-K), O(bytes of one bool vector) per fold.

    device_metrics=True keeps the reduction on-device too: the (N_fold, G)
    prediction never crosses the host link and the fold returns from a
    single 4-scalar readback (``metrics.expression_metrics_device`` — fp32,
    pinned to the fp64 host bundle at rtol 3e-5; the host gt is still used
    for HEG selection so argsort tie-breaking is exact).
    """
    start, stop = bounds[fold]
    n_total = spot_embeddings_full.shape[0]
    mask = np.ones(n_total, bool)
    mask[start:stop] = False
    _, pred_expr = retrieve_and_aggregate(
        spot_embeddings_full,
        expressions_full,
        image_embeddings_full[start:stop],
        top_k=top_k,
        weight_ord=weight_ord,
        key_mask=mask,
        as_device=device_metrics,
    )
    if prediction_path:
        # dirname('') of a bare filename would crash makedirs
        os.makedirs(os.path.dirname(prediction_path) or ".", exist_ok=True)
        np.save(prediction_path, np.asarray(pred_expr).T)  # genes x spots
    if device_metrics:
        from mclstexp_tpu.infer.metrics import expression_metrics_device, heg_indices

        # gt rows already live on-device inside expressions_full; only the
        # HEG argsort runs on the host copy (exact reference tie-break).
        return expression_metrics_device(
            pred_expr, expressions_full[start:stop], heg_indices(expression_gt, 50)
        )
    return expression_metrics(pred_expr, expression_gt)


def load_reference_embeddings(
    embedding_dir: str, num_sections: int, fold: int
) -> tuple[np.ndarray, List[np.ndarray]]:
    """Read one fold's dump in the reference file layout
    (``evel_her2st.py:145-147``: transposed per-section
    ``spot_embeddings_{i+1}.npy`` (P, N_i) plus the held-out section's
    ``img_embeddings_{fold+1}.npy``). Returns (image_query (N_f, P),
    per-section spot embeddings [(N_i, P)])."""
    spots = [
        np.asarray(
            np.load(os.path.join(embedding_dir, f"spot_embeddings_{i + 1}.npy")).T,
            dtype=np.float32,
        )
        for i in range(num_sections)
    ]
    image_query = np.asarray(
        np.load(os.path.join(embedding_dir, f"img_embeddings_{fold + 1}.npy")).T,
        dtype=np.float32,
    )
    return image_query, spots


def evaluate_from_embedding_dumps(
    root: str,
    expressions: Sequence[np.ndarray],
    top_k: int,
    weight_ord: int = 1,
    folds: Optional[Sequence[int]] = None,
    prediction_dir: Optional[str] = None,
    section_names: Optional[Sequence[str]] = None,
) -> Dict[str, object]:
    """Score pre-computed embedding dumps — the reference's phase B
    (``evel_her2st.py:143-226``) — without a model or checkpoint.

    ``root`` holds per-fold ``embeddings_{fold}/`` directories in the
    reference layout (written by either the reference's ``save_embeddings``
    or this repo's ``embed.dump_embeddings``); ``expressions`` are the
    per-section ground-truth (N_i, G) matrices in the same section order.
    This is the interop path: a reference-trained checkpoint's dumps can be
    scored here directly."""
    n = len(expressions)
    folds = list(range(n)) if folds is None else list(folds)
    per_fold = []
    for fold in folds:
        image_query, spots = load_reference_embeddings(
            os.path.join(root, f"embeddings_{fold}"), n, fold
        )
        bad = [
            (i, spots[i].shape[0], expressions[i].shape[0])
            for i in range(n)
            if spots[i].shape[0] != expressions[i].shape[0]
        ]
        if bad:
            raise ValueError(
                "embedding dump / ground-truth spot-count mismatch (section, "
                f"dumped, expected): {bad[:5]} — section order misaligned?"
            )
        pred_path = None
        if prediction_dir and section_names:
            pred_path = os.path.join(
                prediction_dir, section_names[fold],
                "matched_spot_expression_pred.npy",
            )
        per_fold.append(
            evaluate_fold(
                fold, image_query, spots, expressions,
                top_k=top_k, weight_ord=weight_ord, prediction_path=pred_path,
            )
        )
    avg = {k: float(np.mean([m[k] for m in per_fold])) for k in per_fold[0]}
    return {"per_fold": per_fold, "avg": avg, "folds": folds}
