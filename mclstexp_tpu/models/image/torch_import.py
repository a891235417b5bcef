"""Torch state-dict -> flax params conversion for reference checkpoints.

The reference ships/loads plain torch ``state_dict`` files
(``model_result/<ds>/<section>/best_<fold>.pt``, reference ``train.py:90``,
``evel_her2st.py:32-39``). This module maps those tensors onto our flax
trees so reference-trained checkpoints (and ImageNet-pretrained towers
saved from torchvision, when a user supplies them) run unchanged.

Key conventions converted:
  * Conv: OIHW -> HWIO; Linear: (out, in) -> (in, out);
  * BatchNorm: weight/bias -> scale/bias params, running_mean/var ->
    batch_stats;
  * reference module paths (after the ``module.``/``well``->``spot`` shims in
    train/checkpoint.py): ``image_encoder.model.0.*`` (the torchvision
    DenseNet/ResNet ``features`` trunk wrapped in Sequential,
    reference model.py:76,92), ``spot_encoder.{i}.attn.fn.*`` (PreNorm
    wrappers, model.py:60-69), ``image_projection.*`` / ``spot_projection.*``
    (model.py:151-168), ``x_embed.weight`` / ``y_embed.weight``.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from mclstexp_tpu.config import ModelConfig


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


class _TreeBuilder:
    def __init__(self):
        self.params: Dict[str, Any] = {}
        self.batch_stats: Dict[str, Any] = {}
        self.consumed = set()

    def set(self, tree: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    def take(self, sd: Dict[str, np.ndarray], key: str) -> np.ndarray:
        self.consumed.add(key)
        return sd[key]

    def conv(self, sd, key, *path):
        self.set(self.params, (*path, "kernel"), _conv(self.take(sd, key + ".weight")))

    def linear(self, sd, key, *path, bias=True):
        self.set(self.params, (*path, "kernel"), _linear(self.take(sd, key + ".weight")))
        if bias:
            self.set(self.params, (*path, "bias"), self.take(sd, key + ".bias"))

    def bn(self, sd, key, *path):
        self.set(self.params, (*path, "scale"), self.take(sd, key + ".weight"))
        self.set(self.params, (*path, "bias"), self.take(sd, key + ".bias"))
        self.set(self.batch_stats, (*path, "mean"), self.take(sd, key + ".running_mean"))
        self.set(self.batch_stats, (*path, "var"), self.take(sd, key + ".running_var"))
        self.consumed.add(key + ".num_batches_tracked")

    def ln(self, sd, key, *path):
        self.set(self.params, (*path, "scale"), self.take(sd, key + ".weight"))
        self.set(self.params, (*path, "bias"), self.take(sd, key + ".bias"))


def _import_densenet(b: _TreeBuilder, sd, prefix: str, dest: str):
    """torchvision densenet121 ``features`` trunk -> DenseNetEncoder tree."""
    b.conv(sd, f"{prefix}.conv0", dest, "conv0")
    b.bn(sd, f"{prefix}.norm0", dest, "norm0")
    block_config = (6, 12, 24, 16)
    for bi, n_layers in enumerate(block_config, start=1):
        for li in range(1, n_layers + 1):
            base = f"{prefix}.denseblock{bi}.denselayer{li}"
            d = (dest, f"denseblock{bi}", f"denselayer{li}")
            b.bn(sd, f"{base}.norm1", *d, "norm1")
            b.conv(sd, f"{base}.conv1", *d, "conv1")
            b.bn(sd, f"{base}.norm2", *d, "norm2")
            b.conv(sd, f"{base}.conv2", *d, "conv2")
        if bi < len(block_config):
            base = f"{prefix}.transition{bi}"
            b.bn(sd, f"{base}.norm", dest, f"transition{bi}", "norm")
            b.conv(sd, f"{base}.conv", dest, f"transition{bi}", "conv")
    b.bn(sd, f"{prefix}.norm5", dest, "norm5")


_RESNET_STAGES = {
    "res18": ((2, 2, 2, 2), "basic"),
    "resnet50": ((3, 4, 6, 3), "bottleneck"),
    "res101": ((3, 4, 23, 3), "bottleneck"),
}


def _import_resnet(b: _TreeBuilder, sd, prefix: str, dest: str, encoder_name: str):
    """torchvision resnet trunk (wrapped in Sequential: 0=conv1, 1=bn1,
    4..7=layer1..4) -> ResNetEncoder tree."""
    stages, kind = _RESNET_STAGES[encoder_name]
    # Sequential(children[:-1]) renumbers: 0 conv1, 1 bn1, (2 relu, 3 pool), 4-7 layers, 8 avgpool
    b.conv(sd, f"{prefix}.0", dest, "stem", "conv")
    b.bn(sd, f"{prefix}.1", dest, "stem", "bn")
    n_convs = 2 if kind == "basic" else 3
    for si, n_blocks in enumerate(stages):
        for bi in range(n_blocks):
            base = f"{prefix}.{4 + si}.{bi}"
            d = (dest, f"layer{si + 1}_block{bi}")
            for ci in range(1, n_convs + 1):
                b.conv(sd, f"{base}.conv{ci}", *d, f"cb{ci}", "conv")
                b.bn(sd, f"{base}.bn{ci}", *d, f"cb{ci}", "bn")
            if f"{base}.downsample.0.weight" in sd:
                b.conv(sd, f"{base}.downsample.0", *d, "downsample", "conv")
                b.bn(sd, f"{base}.downsample.1", *d, "downsample", "bn")


def _import_attn_block(b: _TreeBuilder, sd, base: str, dest: Tuple[str, ...]):
    """reference attn_block (model.py:60-69): PreNorm(Attention) + PreNorm(FF)."""
    b.ln(sd, f"{base}.attn.norm", *dest, "norm_attn")
    b.linear(sd, f"{base}.attn.fn.to_qkv", *dest, "attn", "to_qkv", bias=False)
    b.linear(sd, f"{base}.attn.fn.to_out.0", *dest, "attn", "to_out")
    b.ln(sd, f"{base}.ff.norm", *dest, "norm_ff")
    b.linear(sd, f"{base}.ff.fn.net.0", *dest, "ff", "fc1")
    b.linear(sd, f"{base}.ff.fn.net.3", *dest, "ff", "fc2")


def _import_projection(b: _TreeBuilder, sd, base: str, dest: str):
    b.linear(sd, f"{base}.projection", dest, "projection")
    b.linear(sd, f"{base}.fc", dest, "fc")
    b.ln(sd, f"{base}.layer_norm", dest, "layer_norm")


def import_reference_state_dict(
    sd: Dict[str, np.ndarray], cfg: ModelConfig
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert a reference mclSTExp state_dict (already key-shimmed) into
    (params, batch_stats) for models.mclstexp.MclSTExp. Raises on unconsumed
    or missing tensors so silent partial imports can't happen."""
    b = _TreeBuilder()

    if cfg.encoder_name == "densenet121":
        _import_densenet(b, sd, "image_encoder.model.0", "image_encoder")
    elif cfg.encoder_name in _RESNET_STAGES:
        _import_resnet(b, sd, "image_encoder.model", "image_encoder", cfg.encoder_name)
    else:
        raise NotImplementedError(
            f"torch import for encoder {cfg.encoder_name!r} not supported"
        )

    if cfg.variant == "attention":
        for i in range(cfg.head_layers):
            _import_attn_block(
                b, sd, f"spot_encoder.{i}", ("spot_encoder", f"block{i}")
            )
        b.set(b.params, ("spot_encoder", "pos", "x_embed"), b.take(sd, "x_embed.weight"))
        b.set(b.params, ("spot_encoder", "pos", "y_embed"), b.take(sd, "y_embed.weight"))
    else:
        b.set(b.params, ("pos", "x_embed"), b.take(sd, "x_embed.weight"))
        b.set(b.params, ("pos", "y_embed"), b.take(sd, "y_embed.weight"))

    _import_projection(b, sd, "image_projection", "image_projection")
    _import_projection(b, sd, "spot_projection", "spot_projection")

    missing = [k for k in sd if k not in b.consumed]
    if missing:
        raise ValueError(f"unconsumed torch tensors: {missing[:8]}{'...' if len(missing) > 8 else ''}")
    return b.params, b.batch_stats


def load_into_state(state, pt_path: str, cfg: ModelConfig):
    """Restore a reference .pt checkpoint into a TrainState (eval use)."""
    import jax

    from mclstexp_tpu.train.checkpoint import load_torch_state_dict

    sd = load_torch_state_dict(pt_path)
    params, batch_stats = import_reference_state_dict(sd, cfg)
    ref_shapes = jax.tree.map(lambda x: x.shape, state.params)
    new_shapes = jax.tree.map(lambda x: x.shape, params)
    if ref_shapes != new_shapes:
        raise ValueError("imported param tree does not match the model's structure")
    return state.replace(params=params, batch_stats=batch_stats)
