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
        os.makedirs(os.path.dirname(prediction_path), exist_ok=True)
        # reference dump layout: genes x spots (evel_her2st.py:189)
        np.save(prediction_path, pred_expr.T)
    return expression_metrics(pred_expr, expression_gt)


def evaluate_folds(
    image_embeddings_per_fold: Sequence[np.ndarray],
    spot_embeddings_per_fold: Sequence[Sequence[np.ndarray]],
    expressions: Sequence[np.ndarray],
    top_k: int,
    weight_ord: int = 1,
    prediction_dir: Optional[str] = None,
    section_names: Optional[Sequence[str]] = None,
) -> Dict[str, object]:
    """Full protocol over all folds; returns per-fold metrics and averages."""
    per_fold = []
    for fold in range(len(expressions)):
        pred_path = None
        if prediction_dir and section_names:
            pred_path = os.path.join(
                prediction_dir,
                section_names[fold],
                "matched_spot_expression_pred.npy",
            )
        m = evaluate_fold(
            fold,
            image_embeddings_per_fold[fold],
            spot_embeddings_per_fold[fold],
            expressions,
            top_k=top_k,
            weight_ord=weight_ord,
            prediction_path=pred_path,
        )
        per_fold.append(m)
    avg = {
        k: float(np.mean([m[k] for m in per_fold])) for k in per_fold[0]
    }
    return {"per_fold": per_fold, "avg": avg}


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
