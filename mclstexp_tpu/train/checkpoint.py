"""Checkpointing: Orbax save/restore (+resume) and torch .pt import shim.

The reference saves a bare ``state_dict`` once per fold at the end of
training (reference ``train.py:87-95``) and loads it with key-compat shims —
``module.`` prefix strip and ``well`` -> ``spot`` rename
(``evel_her2st.py:33-37``). Here checkpoints are Orbax (params + optimizer
state + BN stats + step, so training is resumable mid-fold — SURVEY §5), in
a per-fold directory layout mirroring ``model_result/<ds>/<section>/``.

``load_torch_state_dict`` reads a reference ``.pt`` file (torch CPU is used
only as a file reader) and applies the same key shims, exposing the tensors
as numpy for the converter in ``models/image/torch_import.py``.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state, keep_opt_state: bool = True) -> str:
    """Save a TrainState to <path> (an Orbax directory)."""
    payload = {
        "step": np.asarray(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    if keep_opt_state:
        payload["opt_state"] = jax.device_get(state.opt_state)
    path = os.path.abspath(path)
    _checkpointer().save(path, payload, force=True)
    return path


def restore_checkpoint(path: str) -> Dict[str, Any]:
    return _checkpointer().restore(os.path.abspath(path))


def _restore_like(template, restored):
    """Re-impose `template`'s tree structure on a restored pytree.

    Orbax's untyped restore returns optax states as plain dicts/lists
    (namedtuple types are not serialized), and the first tx.update after a
    resume would crash on e.g. ``ScaleByAdamState.mu`` attribute access.
    Leaf order is preserved (namedtuples flatten in field order; their dict
    restorations flatten in sorted-key order — identical for optax's
    count/mu/nu states, and the leaf-count check guards the rest)."""
    leaves_t, treedef = jax.tree_util.tree_flatten(template)
    leaves_r = jax.tree_util.tree_leaves(restored)
    if len(leaves_r) != len(leaves_t):
        raise ValueError(
            f"restored optimizer state has {len(leaves_r)} leaves, expected "
            f"{len(leaves_t)} — checkpoint saved under a different optimizer?"
        )
    return jax.tree_util.tree_unflatten(treedef, leaves_r)


def apply_checkpoint(state, restored: Dict[str, Any]):
    """Rebuild a TrainState from a restored payload (resume or eval)."""
    import jax.numpy as jnp

    opt_state = state.opt_state
    if restored.get("opt_state") is not None:
        opt_state = _restore_like(state.opt_state, restored["opt_state"])
    return state.replace(
        step=jnp.asarray(restored["step"]),
        params=restored["params"],
        batch_stats=restored.get("batch_stats", state.batch_stats),
        opt_state=opt_state,
    )


def fold_checkpoint_dir(root: str, dataset: str, section_name: str, fold: int) -> str:
    """model_result/<dataset>/<section>/best_<fold> (reference train.py:89-95)."""
    return os.path.join(root, dataset, section_name, f"best_{fold}")


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch ``state_dict`` .pt and apply the reference's key shims."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    out = {}
    for key, tensor in sd.items():
        new_key = key.replace("module.", "").replace("well", "spot")
        out[new_key] = tensor.numpy()
    return out
