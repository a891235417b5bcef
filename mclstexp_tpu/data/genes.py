"""Gene-panel loading.

The three benchmark HVG panels ship with the reference as data artifacts
(``data/her_hvg_cut_1000.npy`` 785 genes, ``data/skin_hvg_cut_1000.npy``
171, ``data/1000hvg_common.pkl`` 685 — SURVEY §2 C18). They are *data*, not
code: we load them from a configured location (``MCLSTEXP_REFERENCE_DATA``
or the mounted reference checkout) rather than vendoring them.
"""

from __future__ import annotations

import os
import pickle
from typing import List, Optional

import numpy as np

from mclstexp_tpu.config import reference_data_root

_PANEL_FILES = {
    "her2st": "her_hvg_cut_1000.npy",
    "cscc": "skin_hvg_cut_1000.npy",
    "visium": "1000hvg_common.pkl",
}

PANEL_SIZES = {"her2st": 785, "cscc": 171, "visium": 685}


def load_panel(dataset: str, path: Optional[str] = None) -> List[str]:
    """Gene-name list for a benchmark dataset (or from an explicit path)."""
    if path is None:
        root = reference_data_root()
        if root is None:
            raise FileNotFoundError(
                f"no gene panel path given and no reference data root found; "
                f"set MCLSTEXP_REFERENCE_DATA or pass gene_panel explicitly"
            )
        path = os.path.join(root, _PANEL_FILES[dataset])
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            panel = pickle.load(f)
        return [str(g) for g in list(panel)]
    return [str(g) for g in np.load(path, allow_pickle=True)]
