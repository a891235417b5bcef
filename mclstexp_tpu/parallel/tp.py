"""Tensor-parallel parameter layouts (GSPMD rules).

The reference has no tensor parallelism (SURVEY §2.3: not needed at ≤30M
params) — this is a scaling feature of the rebuild. Rather than hand-writing
collectives, parameters get `PartitionSpec`s by path-based rules and GSPMD
partitions the matmuls: column-parallel qkv/fc1 (shard the output features),
row-parallel out/fc2 (shard the input features), sharded positional tables
(the 2 x 65536 x G tables dominate the parameter count at large gene
panels: her2st 785-d tables are ~400 MB fp32), and data-parallel everything
else. The "model" axis collectives ride ICI next to the "data" axis
gradient reductions.
"""

from __future__ import annotations

import re
from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, spec) — first match wins; default replicate (data-parallel).
_TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*/to_qkv/kernel$", P(None, "model")),  # column-parallel fused qkv
    (r".*/to_out/kernel$", P("model", None)),  # row-parallel attn out
    (r".*/ff/fc1/kernel$", P(None, "model")),  # column-parallel MLP in
    (r".*/ff/fc2/kernel$", P("model", None)),  # row-parallel MLP out
    (r".*/(x|y)_embed$", P(None, "model")),  # feature-sharded pos tables
    (r".*projection/projection/kernel$", P(None, "model")),
    (r".*projection/fc/kernel$", P("model", None)),
)


def param_spec(path: str) -> P:
    for pattern, spec in _TP_RULES:
        if re.match(pattern, path):
            return spec
    return P()


def _path_str(key_path) -> str:
    return "/" + "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in key_path)


def tp_param_specs(params: Any) -> Any:
    """PartitionSpec pytree for a param tree, by the TP rules."""
    return jax.tree_util.tree_map_with_path(
        lambda kp, _: param_spec(_path_str(kp)), params
    )


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a param tree on the mesh according to the TP rules (no-op specs
    degrade to replication when the mesh has no 'model' axis)."""
    has_model = "model" in mesh.axis_names and mesh.shape.get("model", 1) > 1

    def place(kp, leaf):
        spec = param_spec(_path_str(kp)) if has_model else P()
        # drop specs whose sharded dim doesn't divide evenly — replicate those
        if has_model and spec != P():
            dim = 0 if spec[0] == "model" else (1 if len(spec) > 1 else 0)
            if leaf.ndim <= dim or leaf.shape[dim] % mesh.shape["model"] != 0:
                spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
