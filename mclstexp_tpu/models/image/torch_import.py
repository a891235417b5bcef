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


def _j(prefix: str, name: str) -> str:
    """Join a (possibly empty) torch module prefix with a child name."""
    return f"{prefix}.{name}" if prefix else name


def _import_densenet(b: _TreeBuilder, sd, prefix: str, dest: str):
    """torchvision densenet121 ``features`` trunk -> DenseNetEncoder tree."""
    b.conv(sd, _j(prefix, "conv0"), dest, "conv0")
    b.bn(sd, _j(prefix, "norm0"), dest, "norm0")
    block_config = (6, 12, 24, 16)
    for bi, n_layers in enumerate(block_config, start=1):
        for li in range(1, n_layers + 1):
            base = _j(prefix, f"denseblock{bi}.denselayer{li}")
            d = (dest, f"denseblock{bi}", f"denselayer{li}")
            b.bn(sd, f"{base}.norm1", *d, "norm1")
            b.conv(sd, f"{base}.conv1", *d, "conv1")
            b.bn(sd, f"{base}.norm2", *d, "norm2")
            b.conv(sd, f"{base}.conv2", *d, "conv2")
        if bi < len(block_config):
            base = _j(prefix, f"transition{bi}")
            b.bn(sd, f"{base}.norm", dest, f"transition{bi}", "norm")
            b.conv(sd, f"{base}.conv", dest, f"transition{bi}", "conv")
    b.bn(sd, _j(prefix, "norm5"), dest, "norm5")


_RESNET_STAGES = {
    "res18": ((2, 2, 2, 2), "basic"),
    "resnet50": ((3, 4, 6, 3), "bottleneck"),
    "res101": ((3, 4, 23, 3), "bottleneck"),
    "resnet152": ((3, 8, 36, 3), "bottleneck"),  # BLEEP menu, modules.py:60
}


def _import_resnet(b: _TreeBuilder, sd, prefix: str, dest: str, encoder_name: str):
    """torchvision resnet trunk (wrapped in Sequential: 0=conv1, 1=bn1,
    4..7=layer1..4) -> ResNetEncoder tree."""
    stages, kind = _RESNET_STAGES[encoder_name]
    # Sequential(children[:-1]) renumbers: 0 conv1, 1 bn1, (2 relu, 3 pool), 4-7 layers, 8 avgpool
    b.conv(sd, _j(prefix, "0"), dest, "stem", "conv")
    b.bn(sd, _j(prefix, "1"), dest, "stem", "bn")
    n_convs = 2 if kind == "basic" else 3
    for si, n_blocks in enumerate(stages):
        for bi in range(n_blocks):
            base = _j(prefix, f"{4 + si}.{bi}")
            d = (dest, f"layer{si + 1}_block{bi}")
            for ci in range(1, n_convs + 1):
                b.conv(sd, f"{base}.conv{ci}", *d, f"cb{ci}", "conv")
                b.bn(sd, f"{base}.bn{ci}", *d, f"cb{ci}", "bn")
            if f"{base}.downsample.0.weight" in sd:
                b.conv(sd, f"{base}.downsample.0", *d, "downsample", "conv")
                b.bn(sd, f"{base}.downsample.1", *d, "downsample", "bn")


def _import_vit(b: _TreeBuilder, sd, prefix: str, dest: str):
    """timm ``vit_base_patch32_224`` -> ViTEncoder tree.

    timm key conventions (reference ``model.py:104-116`` creates the tower
    via ``timm.create_model(..., num_classes=0, global_pool="avg")``):
    ``cls_token``, ``pos_embed``, ``patch_embed.proj.*``,
    ``blocks.{i}.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2}.*`` and a
    final ``norm.*`` — stored as ``fc_norm.*`` by timm>=0.6 checkpoints saved
    with ``global_pool="avg"`` (both accepted, mapped to our ``norm``).
    Depth is inferred from the block keys present.
    """
    b.set(b.params, (dest, "cls_token"), b.take(sd, _j(prefix, "cls_token")))
    b.set(b.params, (dest, "pos_embed"), b.take(sd, _j(prefix, "pos_embed")))
    if _j(prefix, "norm_pre.weight") in sd:  # CLIP trunks (pre_norm=True)
        b.ln(sd, _j(prefix, "norm_pre"), dest, "norm_pre")
    b.conv(sd, _j(prefix, "patch_embed.proj"), dest, "patch_embed")
    b.set(
        b.params,
        (dest, "patch_embed", "bias"),
        b.take(sd, _j(prefix, "patch_embed.proj.bias")),
    )
    blocks_pfx = _j(prefix, "blocks.")
    depth = 1 + max(
        (int(k[len(blocks_pfx):].split(".")[0]) for k in sd if k.startswith(blocks_pfx)),
        default=-1,
    )
    if depth <= 0:
        raise ValueError(f"no ViT block tensors found under {blocks_pfx!r}*")
    for i in range(depth):
        base = _j(prefix, f"blocks.{i}")
        d = (dest, f"block{i}")
        b.ln(sd, f"{base}.norm1", *d, "norm_attn")
        b.linear(sd, f"{base}.attn.qkv", *d, "attn", "to_qkv")
        b.linear(sd, f"{base}.attn.proj", *d, "attn", "to_out")
        b.ln(sd, f"{base}.norm2", *d, "norm_ff")
        b.linear(sd, f"{base}.mlp.fc1", *d, "ff", "fc1")
        b.linear(sd, f"{base}.mlp.fc2", *d, "ff", "fc2")
    final = "fc_norm" if _j(prefix, "fc_norm.weight") in sd else "norm"
    b.ln(sd, _j(prefix, final), dest, "norm")


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
    sd: Dict[str, np.ndarray], cfg: ModelConfig, pos_remap=None
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert a reference mclSTExp state_dict (already key-shimmed) into
    (params, batch_stats) for models.mclstexp.MclSTExp. Raises on unconsumed
    or missing tensors so silent partial imports can't happen.

    ``pos_remap`` (data/posremap.PosRemap): gather the (65536, d) positional
    tables at the observed coordinate values instead of prefix-slicing —
    exact for models fed remapped dense coords (the visium preset)."""
    b = _TreeBuilder()

    if cfg.encoder_name == "densenet121":
        _import_densenet(b, sd, "image_encoder.model.0", "image_encoder")
    elif cfg.encoder_name in _RESNET_STAGES:
        _import_resnet(b, sd, "image_encoder.model", "image_encoder", cfg.encoder_name)
    elif cfg.encoder_name in ("vit", "vit_l", "clip_vit"):
        _import_vit(b, sd, "image_encoder.model", "image_encoder")
    else:
        raise NotImplementedError(
            f"torch import for encoder {cfg.encoder_name!r} not supported"
        )

    # Reference checkpoints always carry (65536, d) tables (model.py:204);
    # when cfg.pos_vocab keeps only the reachable prefix (ST presets,
    # config.py), slice it — rows past the prefix are never indexed by the
    # datasets those presets serve, so the slice is exact.
    def _pos_table(key):
        t = b.take(sd, key)
        if pos_remap is not None:
            slicer = pos_remap.slice_x if key.startswith("x_") else pos_remap.slice_y
            return slicer(t)
        return t[: cfg.pos_vocab] if cfg.pos_vocab < t.shape[0] else t

    if cfg.variant == "attention":
        for i in range(cfg.head_layers):
            _import_attn_block(
                b, sd, f"spot_encoder.{i}", ("spot_encoder", f"block{i}")
            )
        b.set(b.params, ("spot_encoder", "pos", "x_embed"), _pos_table("x_embed.weight"))
        b.set(b.params, ("spot_encoder", "pos", "y_embed"), _pos_table("y_embed.weight"))
    else:
        b.set(b.params, ("pos", "x_embed"), _pos_table("x_embed.weight"))
        b.set(b.params, ("pos", "y_embed"), _pos_table("y_embed.weight"))

    _import_projection(b, sd, "image_projection", "image_projection")
    _import_projection(b, sd, "spot_projection", "spot_projection")

    missing = [k for k in sd if k not in b.consumed]
    if missing:
        raise ValueError(f"unconsumed torch tensors: {missing[:8]}{'...' if len(missing) > 8 else ''}")
    return b.params, b.batch_stats


_TOWER_IGNORED_PREFIXES = ("classifier.", "fc.", "head.")


def _canonicalize_tower_sd(
    sd: Dict[str, np.ndarray], encoder_name: str
) -> Dict[str, np.ndarray]:
    """Normalize a tower state dict to the reference's wrapped key layout.

    Accepts any of:
      * a full reference checkpoint's image side (``image_encoder.model.*``);
      * a bare torchvision tower, e.g. ``torchvision.models.densenet121(
        weights=DEFAULT).state_dict()`` (``features.*`` + ignored
        ``classifier.*``) or a resnet (``conv1/bn1/layer{1-4}/fc``);
      * a bare timm ViT (``cls_token``/``pos_embed``/``blocks.*``/...).

    Output keys use empty-prefix canonical names: densenet ``conv0.*``...,
    resnet Sequential numbering ``0/1/4..7`` (reference model.py:90 wraps the
    trunk in ``Sequential(children[:-1])``), vit timm names.
    """
    # Unwrap a full-model or reference-wrapped dict down to tower internals.
    for wrap in ("image_encoder.model.", "model."):
        if any(k.startswith(wrap) for k in sd):
            sd = {k[len(wrap):]: v for k, v in sd.items() if k.startswith(wrap)}
            break
    sd = {
        k: v
        for k, v in sd.items()
        if not any(k.startswith(p) for p in _TOWER_IGNORED_PREFIXES)
    }

    if encoder_name == "densenet121":
        if any(k.startswith("features.") for k in sd):  # bare torchvision
            return {k[len("features."):]: v for k, v in sd.items()}
        if any(k.startswith("0.") for k in sd):  # Sequential(features) wrap
            return {k[len("0."):]: v for k, v in sd.items()}
        return sd
    if encoder_name in _RESNET_STAGES:
        if any(k.startswith("conv1.") for k in sd):  # bare torchvision naming
            remap = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
                     "layer3": "6", "layer4": "7"}
            out = {}
            for k, v in sd.items():
                head, _, rest = k.partition(".")
                out[f"{remap.get(head, head)}.{rest}" if rest else k] = v
            return out
        return sd
    return sd  # vit: timm names are already canonical


def import_image_tower(
    sd: Dict[str, np.ndarray], encoder_name: str
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert an image-tower-only torch state dict (ImageNet-pretrained
    torchvision/timm weights, reference ``model.py:73,89,104-108``) into the
    (params, batch_stats) subtrees of our flax ``image_encoder`` module.
    Strict: raises on unconsumed tower tensors."""
    csd = _canonicalize_tower_sd(sd, encoder_name)
    b = _TreeBuilder()
    if encoder_name == "densenet121":
        _import_densenet(b, csd, "", "image_encoder")
    elif encoder_name in _RESNET_STAGES:
        _import_resnet(b, csd, "", "image_encoder", encoder_name)
    elif encoder_name in ("vit", "vit_l", "clip_vit"):
        _import_vit(b, csd, "", "image_encoder")
    else:
        raise NotImplementedError(
            f"pretrained import for encoder {encoder_name!r} not supported"
        )
    missing = [k for k in csd if k not in b.consumed]
    if missing:
        raise ValueError(
            f"unconsumed tower tensors: {missing[:8]}{'...' if len(missing) > 8 else ''}"
        )
    return b.params["image_encoder"], b.batch_stats.get("image_encoder", {})


def load_pretrained_tower(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    pt_path: str,
    encoder_name: str,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Graft pretrained tower weights from a ``.pt`` into fresh init trees.

    This wires the reference's *default* behavior — training starts from an
    ImageNet-pretrained image tower (reference ``model.py:73``
    ``DenseNet121_Weights.DEFAULT``, ``:89`` ``resnet50(pretrained=True)``,
    ``:104-108`` timm pretrained ViT) — while the spot side stays at its
    torch-parity random init.
    """
    import jax

    from mclstexp_tpu.train.checkpoint import load_torch_state_dict

    sd = load_torch_state_dict(pt_path)
    tower_params, tower_stats = import_image_tower(sd, encoder_name)

    want = jax.tree.map(lambda x: tuple(x.shape), params["image_encoder"])
    got = jax.tree.map(lambda x: tuple(x.shape), tower_params)
    if want != got:
        raise ValueError(
            f"pretrained tower {pt_path!r} does not match the "
            f"{encoder_name!r} architecture"
        )
    new_params = dict(params)
    new_params["image_encoder"] = tower_params
    new_stats = dict(batch_stats)
    if tower_stats:
        new_stats["image_encoder"] = tower_stats
    return new_params, new_stats


def load_into_state(state, pt_path: str, cfg: ModelConfig, pos_remap=None):
    """Restore a reference .pt checkpoint into a TrainState (eval use)."""
    import jax

    from mclstexp_tpu.train.checkpoint import load_torch_state_dict

    sd = load_torch_state_dict(pt_path)
    params, batch_stats = import_reference_state_dict(sd, cfg, pos_remap=pos_remap)
    ref_shapes = jax.tree.map(lambda x: x.shape, state.params)
    new_shapes = jax.tree.map(lambda x: x.shape, params)
    if ref_shapes != new_shapes:
        raise ValueError("imported param tree does not match the model's structure")
    return state.replace(params=params, batch_stats=batch_stats)
