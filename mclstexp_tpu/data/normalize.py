"""Expression normalization (NumPy, no scanpy/scprep dependency).

The reference normalizes every section with
``scp.transform.log(scp.normalize.library_size_normalize(mtx))``
(reference ``dataset.py:188``, ``hvg_her2st.py:120``): L1-normalize each
spot's counts, rescale (scprep default 10,000), then log10(x + 1)
(scprep defaults pseudocount=1, base=10).

Both knobs are explicit here. Note for metric parity: the log base only
rescales values linearly, so gene-wise PCC is invariant to it, while
MSE/MAE are not — ``base=10`` is the parity setting.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np


def library_size_normalize(
    counts: np.ndarray, rescale: Union[float, str, None] = 10000.0
) -> np.ndarray:
    """L1-normalize rows (spots) and rescale.

    rescale: a number, 'median'/'mean' (of the library sizes), or None (L1 only).
    Zero-count spots are left at zero rather than producing NaNs.
    """
    counts = np.asarray(counts, dtype=np.float64)
    lib = counts.sum(axis=1, keepdims=True)
    safe_lib = np.where(lib == 0, 1.0, lib)
    normed = counts / safe_lib
    if rescale is None:
        factor = 1.0
    elif isinstance(rescale, str):
        sizes = lib[lib > 0]
        factor = float(np.median(sizes)) if rescale == "median" else float(np.mean(sizes))
    else:
        factor = float(rescale)
    return normed * factor


def log_transform(
    x: np.ndarray, pseudocount: float = 1.0, base: float = 10.0
) -> np.ndarray:
    """scprep.transform.log equivalent: log_base(x + pseudocount)."""
    return (np.log(np.asarray(x, dtype=np.float64) + pseudocount) / np.log(base)).astype(
        np.float32
    )


def normalize_total(counts: np.ndarray, target_sum: Optional[float] = None) -> np.ndarray:
    """scanpy ``sc.pp.normalize_total`` equivalent (used by the HVG pipeline,
    reference ``hvg_her2st.py:35``): scale each spot to target_sum; default
    target is the median library size."""
    counts = np.asarray(counts, dtype=np.float64)
    lib = counts.sum(axis=1, keepdims=True)
    if target_sum is None:
        target_sum = float(np.median(lib[lib > 0]))
    safe_lib = np.where(lib == 0, 1.0, lib)
    return counts / safe_lib * target_sum


def log1p(x: np.ndarray) -> np.ndarray:
    """scanpy ``sc.pp.log1p`` equivalent (natural log)."""
    return np.log1p(np.asarray(x, dtype=np.float64))


def logcpm_panel(counts_panel: np.ndarray) -> np.ndarray:
    """The full reference preprocessing for a section already subset to the
    gene panel: log10(1 + 1e4 * x / libsize). Returns float32 (N, G)."""
    return log_transform(library_size_normalize(counts_panel))


def pergene_logcpm(counts_panel: np.ndarray) -> np.ndarray:
    """Per-GENE library-size normalization — the reference's *eval-phase*
    matrices.

    All three reference hvg scripts build ``preprocessed_matrix.npy`` by
    transposing to genes x spots BEFORE scprep's row-normalizer
    (``hvg_her2st.py:108,118-120``: ``adata[:, gene_list].X.T`` then
    ``scp.transform.log(scp.normalize.library_size_normalize(mtx))`` —
    likewise ``hvg_cscc.py:106,112-114`` and ``hvg_visium.py:218-243``), so
    every GENE row is scaled to a 10,000 'library', unlike the per-SPOT
    normalization the training datasets apply (``dataset.py:53,188``). The
    eval protocol (``evel_her2st.py:136-171``) reads those files as both
    retrieval keys and ground truth, making this quirk part of the headline
    metrics. Returns float32 (N, G) — same layout as the train expression,
    different values.
    """
    return log_transform(library_size_normalize(counts_panel.T)).T
