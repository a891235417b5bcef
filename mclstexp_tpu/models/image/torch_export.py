"""Flax params -> reference torch ``state_dict`` export (reverse interop).

``torch_import.import_reference_state_dict`` makes reference-trained ``.pt``
checkpoints runnable here; this module closes the loop: a model trained in
this framework exports to the EXACT ``state_dict`` layout the reference's
torch code constructs (``mclSTExp_Attention``, reference ``model.py:201-247``;
``mclSTExp_MLP``, ``model.py:171-198`` — including its ``image_ecode``
attribute-name typo at ``model.py:176``), so the reference's eval scripts
(``evel_her2st.py:32-39``) and tutorial flows consume our checkpoints
unchanged: ``ref_model.load_state_dict(exported, strict=True)`` holds
(tested against the reference module itself in ``tests/test_torch_export.py``).

Layout inversions performed (the exact inverses of ``torch_import``):
  * Conv kernels HWIO -> OIHW; Linear kernels (in, out) -> (out, in);
  * BatchNorm ``scale``/``bias`` params -> ``weight``/``bias``; ``mean``/
    ``var`` batch_stats -> ``running_mean``/``running_var``; a zero
    ``num_batches_tracked`` is synthesized (torch tracks it, we don't — it
    only feeds torch's ``momentum=None`` cumulative-average mode, which the
    reference never uses);
  * positional tables are padded back to the reference's 65536-row
    ``nn.Embedding`` shape (``model.py:204-205``) when an ST preset kept
    only the reachable prefix (``ModelConfig.pos_vocab``) — the padded rows
    are zero, and provably unreachable for the dataset the prefix serves.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from mclstexp_tpu.config import ModelConfig
from mclstexp_tpu.models.image.torch_import import _RESNET_STAGES, _j

_REFERENCE_POS_ROWS = 65536  # nn.Embedding(65536, d), reference model.py:204


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (3, 2, 0, 1))  # HWIO -> OIHW


def _linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


class _Exporter:
    """Walks the flax (params, batch_stats) trees and emits torch keys.

    Every leaf read is recorded so ``export_reference_state_dict`` can fail
    loudly on unconsumed leaves — the same no-silent-partial guarantee the
    importer gives in the other direction.
    """

    def __init__(self, params: Dict[str, Any], batch_stats: Dict[str, Any]):
        self.params = params
        self.batch_stats = batch_stats
        self.out: Dict[str, np.ndarray] = {}
        self.consumed = set()

    def _get(self, tree: Dict[str, Any], path) -> np.ndarray:
        node = tree
        for p in path:
            node = node[p]
        self.consumed.add((tree is self.batch_stats, tuple(path)))
        return np.asarray(node)

    def conv(self, key: str, *path: str):
        self.out[key + ".weight"] = _conv(self._get(self.params, (*path, "kernel")))

    def linear(self, key: str, *path: str, bias: bool = True):
        self.out[key + ".weight"] = _linear(self._get(self.params, (*path, "kernel")))
        if bias:
            self.out[key + ".bias"] = self._get(self.params, (*path, "bias"))

    def bn(self, key: str, *path: str):
        self.out[key + ".weight"] = self._get(self.params, (*path, "scale"))
        self.out[key + ".bias"] = self._get(self.params, (*path, "bias"))
        self.out[key + ".running_mean"] = self._get(self.batch_stats, (*path, "mean"))
        self.out[key + ".running_var"] = self._get(self.batch_stats, (*path, "var"))
        self.out[key + ".num_batches_tracked"] = np.asarray(0, dtype=np.int64)

    def ln(self, key: str, *path: str):
        self.out[key + ".weight"] = self._get(self.params, (*path, "scale"))
        self.out[key + ".bias"] = self._get(self.params, (*path, "bias"))

    def raw(self, key: str, *path: str):
        self.out[key] = self._get(self.params, path)


def _export_densenet(e: _Exporter, prefix: str, src: str):
    e.conv(_j(prefix, "conv0"), src, "conv0")
    e.bn(_j(prefix, "norm0"), src, "norm0")
    block_config = (6, 12, 24, 16)  # densenet121
    for bi, n_layers in enumerate(block_config, start=1):
        for li in range(1, n_layers + 1):
            base = _j(prefix, f"denseblock{bi}.denselayer{li}")
            d = (src, f"denseblock{bi}", f"denselayer{li}")
            e.bn(f"{base}.norm1", *d, "norm1")
            e.conv(f"{base}.conv1", *d, "conv1")
            e.bn(f"{base}.norm2", *d, "norm2")
            e.conv(f"{base}.conv2", *d, "conv2")
        if bi < len(block_config):
            base = _j(prefix, f"transition{bi}")
            e.bn(f"{base}.norm", src, f"transition{bi}", "norm")
            e.conv(f"{base}.conv", src, f"transition{bi}", "conv")
    e.bn(_j(prefix, "norm5"), src, "norm5")


def _export_resnet(e: _Exporter, prefix: str, src: str, encoder_name: str):
    # Sequential(children[:-1]) numbering: 0 conv1, 1 bn1, 4..7 layer1..4
    # (reference model.py:90).
    stages, kind = _RESNET_STAGES[encoder_name]
    e.conv(_j(prefix, "0"), src, "stem", "conv")
    e.bn(_j(prefix, "1"), src, "stem", "bn")
    n_convs = 2 if kind == "basic" else 3
    for si, n_blocks in enumerate(stages):
        for bi in range(n_blocks):
            base = _j(prefix, f"{4 + si}.{bi}")
            d = (src, f"layer{si + 1}_block{bi}")
            for ci in range(1, n_convs + 1):
                e.conv(f"{base}.conv{ci}", *d, f"cb{ci}", "conv")
                e.bn(f"{base}.bn{ci}", *d, f"cb{ci}", "bn")
            if "downsample" in e.params[src][f"layer{si + 1}_block{bi}"]:
                e.conv(f"{base}.downsample.0", *d, "downsample", "conv")
                e.bn(f"{base}.downsample.1", *d, "downsample", "bn")


def _export_vit(e: _Exporter, prefix: str, src: str):
    # timm ``vit_base_patch32_224`` naming, the form the reference creates
    # (model.py:104-116) and torch_import consumes.
    e.raw(_j(prefix, "cls_token"), src, "cls_token")
    e.raw(_j(prefix, "pos_embed"), src, "pos_embed")
    if "norm_pre" in e.params[src]:  # CLIP trunks (pre_norm=True)
        e.ln(_j(prefix, "norm_pre"), src, "norm_pre")
    e.conv(_j(prefix, "patch_embed.proj"), src, "patch_embed")
    e.out[_j(prefix, "patch_embed.proj.bias")] = e._get(
        e.params, (src, "patch_embed", "bias")
    )
    depth = 1 + max(
        (int(k[len("block"):]) for k in e.params[src] if k.startswith("block")),
        default=-1,
    )
    for i in range(depth):
        base = _j(prefix, f"blocks.{i}")
        d = (src, f"block{i}")
        e.ln(f"{base}.norm1", *d, "norm_attn")
        e.linear(f"{base}.attn.qkv", *d, "attn", "to_qkv")
        e.linear(f"{base}.attn.proj", *d, "attn", "to_out")
        e.ln(f"{base}.norm2", *d, "norm_ff")
        e.linear(f"{base}.mlp.fc1", *d, "ff", "fc1")
        e.linear(f"{base}.mlp.fc2", *d, "ff", "fc2")
    # Final-norm key: the reference builds its ViT with global_pool="avg"
    # (model.py:104-116), and timm >= 0.6 then stores the post-pool
    # LayerNorm as ``fc_norm.*`` with ``norm`` an Identity — so a
    # strict=True load needs ``fc_norm``. CLIP trunks (pre_norm towers,
    # token pooling) keep timm's ``norm.*``. torch_import accepts both.
    final_norm = "norm" if "norm_pre" in e.params[src] else "fc_norm"
    e.ln(_j(prefix, final_norm), src, "norm")


def _export_attn_block(e: _Exporter, base: str, src):
    # reference attn_block (model.py:60-69): PreNorm(Attention) + PreNorm(FF);
    # Attention.to_qkv has no bias (model.py:44), to_out is Sequential[0].
    e.ln(f"{base}.attn.norm", *src, "norm_attn")
    e.linear(f"{base}.attn.fn.to_qkv", *src, "attn", "to_qkv", bias=False)
    e.linear(f"{base}.attn.fn.to_out.0", *src, "attn", "to_out")
    e.ln(f"{base}.ff.norm", *src, "norm_ff")
    e.linear(f"{base}.ff.fn.net.0", *src, "ff", "fc1")
    e.linear(f"{base}.ff.fn.net.3", *src, "ff", "fc2")


def _export_projection(e: _Exporter, base: str, src: str):
    e.linear(f"{base}.projection", src, "projection")
    e.linear(f"{base}.fc", src, "fc")
    e.ln(f"{base}.layer_norm", src, "layer_norm")


def _export_tower(e: _Exporter, cfg: ModelConfig, torch_attr: str):
    if cfg.encoder_name == "densenet121":
        # ImageEncoder wraps the trunk in Sequential (reference model.py:76):
        # tower keys live under ``<attr>.model.0``.
        _export_densenet(e, f"{torch_attr}.model.0", "image_encoder")
    elif cfg.encoder_name in _RESNET_STAGES:
        _export_resnet(e, f"{torch_attr}.model", "image_encoder", cfg.encoder_name)
    elif cfg.encoder_name in ("vit", "vit_l", "clip_vit"):
        _export_vit(e, f"{torch_attr}.model", "image_encoder")
    else:
        raise NotImplementedError(
            f"torch export for encoder {cfg.encoder_name!r} not supported"
        )


def _pad_pos_table(table: np.ndarray, pos_rows: int) -> np.ndarray:
    if table.shape[0] >= pos_rows:
        return table
    pad = np.zeros((pos_rows - table.shape[0], table.shape[1]), dtype=table.dtype)
    return np.concatenate([table, pad], axis=0)


def export_reference_state_dict(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    cfg: ModelConfig,
    pos_rows: int = _REFERENCE_POS_ROWS,
    verify: bool = True,
    pos_remap=None,
) -> Dict[str, np.ndarray]:
    """Convert (params, batch_stats) of ``models.mclstexp.MclSTExp`` into the
    reference's torch ``state_dict`` layout.

    ``pos_rows`` pads the positional tables back up to the reference's
    hard-coded ``nn.Embedding(65536, d)`` rows (zeros beyond
    ``cfg.pos_vocab`` — unreachable for the preset that sliced them).
    ``pos_remap`` (data/posremap.PosRemap, visium preset): SCATTER the compact
    rows back to their raw-coordinate rows instead of prefix-padding; zeros
    elsewhere (unreachable by the dataset the remap was built from).
    ``verify`` re-imports the exported dict through
    ``import_reference_state_dict`` and asserts bit-equality against the
    inputs, making a silently lossy export impossible.
    """
    e = _Exporter(params, batch_stats)
    tower_attr = "image_encoder" if cfg.variant == "attention" else "image_ecode"
    _export_tower(e, cfg, tower_attr)

    if cfg.variant == "attention":
        for i in range(cfg.head_layers):
            _export_attn_block(e, f"spot_encoder.{i}", ("spot_encoder", f"block{i}"))
        pos_src = ("spot_encoder", "pos")
    else:
        pos_src = ("pos",)
    if pos_remap is not None:
        e.out["x_embed.weight"] = pos_remap.scatter_x(
            e._get(e.params, (*pos_src, "x_embed")), pos_rows
        )
        e.out["y_embed.weight"] = pos_remap.scatter_y(
            e._get(e.params, (*pos_src, "y_embed")), pos_rows
        )
    else:
        e.out["x_embed.weight"] = _pad_pos_table(
            e._get(e.params, (*pos_src, "x_embed")), pos_rows
        )
        e.out["y_embed.weight"] = _pad_pos_table(
            e._get(e.params, (*pos_src, "y_embed")), pos_rows
        )

    _export_projection(e, "image_projection", "image_projection")
    _export_projection(e, "spot_projection", "spot_projection")

    def _unconsumed(tree, is_stats, prefix=()):
        missing = []
        for k, v in tree.items():
            if isinstance(v, dict):
                missing += _unconsumed(v, is_stats, (*prefix, k))
            elif (is_stats, (*prefix, k)) not in e.consumed:
                missing.append(".".join((*prefix, k)))
        return missing

    leftovers = _unconsumed(params, False) + _unconsumed(batch_stats, True)
    if leftovers:
        raise ValueError(
            f"unexported tree leaves: {leftovers[:8]}"
            f"{'...' if len(leftovers) > 8 else ''}"
        )

    if verify:
        _verify_roundtrip(e.out, params, batch_stats, cfg, pos_remap=pos_remap)
    return e.out


def _flatten(tree: Dict[str, Any], prefix=()) -> Dict[tuple, np.ndarray]:
    flat = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            flat.update(_flatten(v, (*prefix, k)))
        else:
            flat[(*prefix, k)] = np.asarray(v)
    return flat


def _verify_roundtrip(sd, params, batch_stats, cfg: ModelConfig,
                      pos_remap=None) -> None:
    from mclstexp_tpu.models.image.torch_import import import_reference_state_dict

    # The importer expects the attention variant's attribute names; shim the
    # mlp tower typo the same way reference checkpoints are shimmed.
    shimmed = {k.replace("image_ecode.", "image_encoder."): v for k, v in sd.items()}
    re_params, re_stats = import_reference_state_dict(shimmed, cfg,
                                                      pos_remap=pos_remap)
    for got, want, label in ((re_params, params, "params"),
                             (re_stats, batch_stats, "batch_stats")):
        flat_got, flat_want = _flatten(got), _flatten(want)
        if flat_got.keys() != flat_want.keys():
            raise AssertionError(f"export roundtrip changed the {label} tree")
        for path, leaf in flat_got.items():
            other = flat_want[path]
            if pos_remap is not None and path[-1] in ("x_embed", "y_embed"):
                # compact-table padding rows (never indexed) scatter to
                # nowhere and reimport as zeros: compare observed rows only
                n = len(pos_remap.x_values if path[-1] == "x_embed"
                        else pos_remap.y_values)
                leaf, other = leaf[:n], other[:n]
            if not np.array_equal(leaf, other):
                raise AssertionError(
                    f"export roundtrip mismatch at {label}.{'.'.join(path)}"
                )


def save_reference_checkpoint(
    path: str,
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    cfg: ModelConfig,
    pos_rows: int = _REFERENCE_POS_ROWS,
    verify: bool = True,
    pos_remap=None,
) -> str:
    """``torch.save`` a reference-layout ``state_dict`` .pt — the file format
    the reference's eval scripts load (``evel_her2st.py:32``)."""
    import torch

    sd = export_reference_state_dict(
        params, batch_stats, cfg, pos_rows=pos_rows, verify=verify,
        pos_remap=pos_remap,
    )
    torch.save(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, path
    )
    return path
