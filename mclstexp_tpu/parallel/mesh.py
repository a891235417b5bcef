"""Device-mesh and sharding helpers.

The reference's only distribution is torch DDP over NCCL in one baseline
(``baselines/Bleep/BLEEP_main.py:112-147``); core training is single-GPU.
Here parallelism is native: a `jax.sharding.Mesh`, batches sharded on the
"data" axis, parameters replicated (and optionally tensor-sharded on a
"model" axis for the wide projection/embedding matmuls), with XLA inserting
the collectives — the contrastive logit matrix pulls a (B, 256) all-gather
over ICI per step, which is negligible.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axes: Tuple[str, ...] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A mesh over the available devices; default 1-D "data" mesh."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(shape)
    return Mesh(arr, axes)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh, axis: str = "data"):
    """Put a host batch onto the mesh, sharded on the leading axis when the
    size divides the axis length, else replicated (remainder batches)."""
    n_shards = mesh.shape[axis]
    out = {}
    for k, v in batch.items():
        if len(v) % n_shards == 0:
            out[k] = jax.device_put(v, batch_sharding(mesh, axis))
        else:
            out[k] = jax.device_put(v, replicated(mesh))
    return out
