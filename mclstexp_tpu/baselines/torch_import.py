"""Torch state-dict -> flax conversion for the BASELINE families.

The reference trains its comparison baselines with Lightning/torch and saves
plain ``state_dict`` checkpoints (``HIST2ST_train.py:98``, HisToGene tutorial
cell 3, ``BLEEP_main.py:179-186``). These importers map those tensors onto
our flax trees so reference-trained baseline checkpoints score through this
framework unchanged — and they power the whole-model A/B parity tests that
run the reference's own model code side by side with ours
(``tests/test_baseline_reference_ab.py``).

Torch module paths converted (one function per family):

  * HisToGene (``baselines/HisToGene/vis_model.py:144-158``):
    ``patch_embedding`` Linear, ``x_embed``/``y_embed``,
    ``vit.transformer.layers.{i}.{0,1}`` PreNorm pairs, ``gene_head.{0,1}``.
  * Hist2ST (``baselines/His2ST/HIST2ST.py:85-132``): conv
    ``patch_embedding``, ``vit.transformer.layer1`` convmixers, ``layer2``
    attn blocks, ``layer3`` GraphSAGE, ``jknet`` 2-layer LSTM, ``down``,
    ZINB/NB heads, bake ``coef`` head, ``gene_head``.
  * THItoGene (``baselines/THItoGene/vis_model.py:153-207``): ``odconv2d``
    (+ its four-way attention), ``caps_layer`` (conv trunk, primary caps,
    routing), ``vit``, ``gat``, ``gene_head``.
  * BLEEP (``baselines/Bleep/models.py:9-43``): timm image tower +
    ``image_projection``/``spot_projection``.

Conventions: Conv OIHW -> HWIO (+bias where torch has one), Linear
(out, in) -> (in, out), 1x1-conv-as-Dense squeeze, BatchNorm weight/bias ->
scale/bias params with running stats in batch_stats, LSTM gate chunks
[i, f, g, o] -> flax cell Denses (torch's two bias vectors sum into the
cell's single hidden-side bias). Every importer is strict: unconsumed or
missing tensors raise, so silent partial imports can't happen.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from mclstexp_tpu.models.image.torch_import import (
    _import_attn_block,
    _import_projection,
    _linear,
    _TreeBuilder,
    import_image_tower,
)


def _conv_with_bias(b: _TreeBuilder, sd, key: str, *path: str) -> None:
    b.conv(sd, key, *path)
    b.set(b.params, (*path, "bias"), b.take(sd, key + ".bias"))


def _dense_from_1x1(
    b: _TreeBuilder, sd, key: str, *path: str, bias: bool = True
) -> None:
    """torch 1x1 Conv2d acting on pooled (B, C, 1, 1) == our Dense."""
    w = b.take(sd, key + ".weight")  # (out, in, 1, 1)
    b.set(b.params, (*path, "kernel"), w[:, :, 0, 0].T)
    if bias:
        b.set(b.params, (*path, "bias"), b.take(sd, key + ".bias"))


def _import_slide_vit(b: _TreeBuilder, sd, prefix: str, dest: str, depth: int):
    """The baselines' shared ViT (``HisToGene/transformer.py:66-92``,
    ``THItoGene/transformer.py``): ``{prefix}.transformer.layers.{i}`` holds
    ``[PreNorm(Attention), PreNorm(FeedForward)]`` ModuleLists."""
    for i in range(depth):
        base = f"{prefix}.transformer.layers.{i}"
        d = (dest, f"block{i}")
        b.ln(sd, f"{base}.0.norm", *d, "norm_attn")
        b.linear(sd, f"{base}.0.fn.to_qkv", *d, "attn", "to_qkv", bias=False)
        b.linear(sd, f"{base}.0.fn.to_out.0", *d, "attn", "to_out")
        b.ln(sd, f"{base}.1.norm", *d, "norm_ff")
        b.linear(sd, f"{base}.1.fn.net.0", *d, "ff", "fc1")
        b.linear(sd, f"{base}.1.fn.net.3", *d, "ff", "fc2")


def _import_lstm_layer(b: _TreeBuilder, sd, base: str, layer: int, dest: str):
    """One torch ``nn.LSTM`` layer -> one flax ``RNN(OptimizedLSTMCell)``.

    torch packs gates as [i, f, g, o] row chunks of ``weight_ih_l{k}`` /
    ``weight_hh_l{k}``; flax names the per-gate Denses ii/if/ig/io (input,
    no bias) and hi/hf/hg/ho (hidden, bias). torch's two bias vectors add
    inside the cell, so their sum lands on the flax hidden-side bias
    (cross-checked in ``tests/test_baselines.py:test_jk_lstm_matches_torch``).
    """
    w_ih = b.take(sd, f"{base}.weight_ih_l{layer}")  # (4d, d_in)
    w_hh = b.take(sd, f"{base}.weight_hh_l{layer}")  # (4d, d)
    b_ih = b.take(sd, f"{base}.bias_ih_l{layer}")
    b_hh = b.take(sd, f"{base}.bias_hh_l{layer}")
    d = w_hh.shape[1]
    gates = (("ii", "hi"), ("if", "hf"), ("ig", "hg"), ("io", "ho"))
    for gi, (g_in, g_h) in enumerate(gates):
        sl = slice(gi * d, (gi + 1) * d)
        b.set(b.params, (dest, g_in, "kernel"), w_ih[sl].T)
        b.set(b.params, (dest, g_h, "kernel"), w_hh[sl].T)
        b.set(b.params, (dest, g_h, "bias"), b_ih[sl] + b_hh[sl])


def _finish(b: _TreeBuilder, sd) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    missing = [k for k in sd if k not in b.consumed]
    if missing:
        raise ValueError(
            f"unconsumed torch tensors: {missing[:8]}"
            f"{'...' if len(missing) > 8 else ''}"
        )
    return b.params, b.batch_stats


def import_histogene_state_dict(
    sd: Dict[str, np.ndarray], model
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """HisToGene checkpoint -> (params, batch_stats) for our ``HisToGene``.

    The reference dataset flattens patches in (h, w, c) order
    (``HisToGene/dataset.py:296,335``: the slide tensor is HWC and
    ``patch.flatten()`` runs row-major), which is exactly our NHWC
    ``patches.reshape(n, -1)`` — so ``patch_embedding`` maps with no column
    permutation.
    """
    b = _TreeBuilder()
    b.linear(sd, "patch_embedding", "patch_embedding")
    b.set(b.params, ("pos", "x_embed"), b.take(sd, "x_embed.weight"))
    b.set(b.params, ("pos", "y_embed"), b.take(sd, "y_embed.weight"))
    _import_slide_vit(b, sd, "vit", "vit", model.n_layers)
    b.ln(sd, "gene_head.0", "head_norm")
    b.linear(sd, "gene_head.1", "gene_head")
    return _finish(b, sd)


def import_hist2st_state_dict(
    sd: Dict[str, np.ndarray], model
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Hist2ST checkpoint -> (params, batch_stats) for our ``Hist2ST``.

    The token feature basis matches element-for-element because our model
    flattens the down-projected conv map in the reference's NCHW
    ``nn.Flatten`` order (``HIST2ST.py:50-53``; see models.py).
    """
    b = _TreeBuilder()
    _conv_with_bias(b, sd, "patch_embedding", "patch_embedding")
    b.set(b.params, ("pos", "x_embed"), b.take(sd, "x_embed.weight"))
    b.set(b.params, ("pos", "y_embed"), b.take(sd, "y_embed.weight"))

    t = "vit.transformer"
    for i in range(model.depth1):
        base, d = f"{t}.layer1.{i}", f"mixer{i}"
        _conv_with_bias(b, sd, f"{base}.dw.0", d, "dw1_conv")
        b.bn(sd, f"{base}.dw.1", d, "dw1_bn")
        _conv_with_bias(b, sd, f"{base}.dw.3", d, "dw2_conv")
        b.bn(sd, f"{base}.dw.4", d, "dw2_bn")
        _conv_with_bias(b, sd, f"{base}.pw.0", d, "pw_conv")
        b.bn(sd, f"{base}.pw.2", d, "pw_bn")
    _conv_with_bias(b, sd, f"{t}.down.0", "down")
    for i in range(model.depth2):
        _import_attn_block(b, sd, f"{t}.layer2.{i}", ("vit", f"block{i}"))
    for i in range(model.depth3):
        # gs_block stores weight (embed, feat) applied as W @ x.T (gcn.py:23-35)
        b.set(
            b.params, (f"gs{i}", "weight", "kernel"),
            _linear(b.take(sd, f"{t}.layer3.{i}.weight")),
        )
    _import_lstm_layer(b, sd, f"{t}.jknet.0", 0, "jknet_cell")
    _import_lstm_layer(b, sd, f"{t}.jknet.0", 1, "jknet2_cell")

    b.ln(sd, "gene_head.0", "head_norm")
    b.linear(sd, "gene_head.1", "gene_head")
    if model.zinb:
        if model.nb:
            b.linear(sd, "hr", "hr")
            b.linear(sd, "hp", "hp")
        else:
            b.linear(sd, "mean.0", "mean")
            b.linear(sd, "disp.0", "disp")
            b.linear(sd, "pi.0", "pi")
    if model.coef_head:
        b.linear(sd, "coef.0", "coef_fc1")
        b.linear(sd, "coef.2", "coef_fc2")
    return _finish(b, sd)


def import_thitogene_state_dict(
    sd: Dict[str, np.ndarray], model
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """THItoGene checkpoint -> (params, batch_stats) for our ``THItoGene``."""
    b = _TreeBuilder()

    # ODConv2d: four-way attention + candidate kernels (ODConv.py:86-141).
    a = "odconv2d.attention"
    _dense_from_1x1(b, sd, f"{a}.fc", "odconv", "fc", bias=False)
    b.bn(sd, f"{a}.bn", "odconv", "bn")
    _dense_from_1x1(b, sd, f"{a}.channel_fc", "odconv", "channel_fc")
    _dense_from_1x1(b, sd, f"{a}.filter_fc", "odconv", "filter_fc")
    _dense_from_1x1(b, sd, f"{a}.spatial_fc", "odconv", "spatial_fc")
    _dense_from_1x1(b, sd, f"{a}.kernel_fc", "odconv", "kernel_fc")
    # candidate kernels (Kn, Cout, Cin, k, k) -> our matmul layout
    # (Kn, k*k*Cin, Cout), taps flattened (ki, kj, c) to match the NHWC
    # patch extraction (baselines/layers.py:ODConv).
    w = b.take(sd, "odconv2d.weight")
    kn, cout, cin, k, _ = w.shape
    b.set(
        b.params, ("odconv", "weight"),
        w.transpose(0, 3, 4, 2, 1).reshape(kn, k * k * cin, cout),
    )

    c = "caps_layer"
    for i in range(1, 5):
        _conv_with_bias(b, sd, f"{c}.conv{i}", "caps", f"c{i}_conv")
        b.bn(sd, f"{c}.batch_norm{i}", "caps", f"c{i}_bn")
    _conv_with_bias(b, sd, f"{c}.primary_caps.depthwise_conv", "caps", "primary_dw")
    b.set(b.params, ("caps", "digit_caps", "W"), b.take(sd, f"{c}.digit_caps.W"))
    b.set(b.params, ("caps", "digit_caps", "b"), b.take(sd, f"{c}.digit_caps.b"))

    b.set(b.params, ("x_embed",), b.take(sd, "x_embed.weight"))
    b.set(b.params, ("y_embed",), b.take(sd, "y_embed.weight"))
    _import_slide_vit(b, sd, "vit", "vit", model.n_layers)

    # GAT: W is (in, out) applied as h @ W (GATLayer.py:37-46) — no transpose.
    for i in range(model.heads[1]):
        g = f"gat.attention_{i}"
        b.set(b.params, ("gat", f"attention_{i}", "W", "kernel"), b.take(sd, f"{g}.W"))
        b.set(b.params, ("gat", f"attention_{i}", "a"), b.take(sd, f"{g}.a"))
    b.set(b.params, ("gat", "out_att", "W", "kernel"), b.take(sd, "gat.out_att.W"))
    b.set(b.params, ("gat", "out_att", "a"), b.take(sd, "gat.out_att.a"))

    # gene_head = Sequential(Linear, ReLU, LayerNorm, Linear)
    b.linear(sd, "gene_head.0", "head_fc1")
    b.ln(sd, "gene_head.2", "head_norm")
    b.linear(sd, "gene_head.3", "head_fc2")
    return _finish(b, sd)


IMPORTERS = {
    "histogene": import_histogene_state_dict,
    "hist2st": import_hist2st_state_dict,
    "thitogene": import_thitogene_state_dict,
    "bleep": lambda sd, m: import_bleep_state_dict(sd, m),
}


def load_baseline_torch_checkpoint(
    path: str, family: str, model
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Read a reference-trained baseline checkpoint from disk.

    Accepts a plain ``state_dict`` .pt (``BLEEP_main.py:179-186``) or a
    Lightning ``.ckpt`` (``HIST2ST_train.py:98``, HisToGene tutorial cell 3
    — a dict whose ``state_dict`` entry holds the module tensors, possibly
    ``model.``/``module.``-prefixed).
    """
    import torch

    try:
        raw = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:  # Lightning ckpts may pickle non-tensor metadata
        raw = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(raw.get("state_dict", None), dict):
        raw = raw["state_dict"]
    sd = {}
    for k, v in raw.items():
        k = k.replace("module.", "")
        if k.startswith("model."):
            k = k[len("model."):]
        sd[k] = np.asarray(v.detach().cpu().numpy()) if hasattr(v, "detach") else np.asarray(v)
    return IMPORTERS[family](sd, model)


def import_bleep_state_dict(
    sd: Dict[str, np.ndarray], model
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """BLEEP CLIPModel checkpoint -> (params, batch_stats) for our ``BLEEP``.

    The image tower rides ``import_image_tower`` (timm resnet/vit naming ==
    bare torchvision naming for the trunks BLEEP uses, ``modules.py:7-132``);
    the two projection heads map like the flagship's.
    """
    b = _TreeBuilder()
    tower_keys = {
        k[len("image_encoder.model."):]: v
        for k, v in sd.items()
        if k.startswith("image_encoder.model.")
    }
    tower_params, tower_stats = import_image_tower(tower_keys, model.encoder_name)
    b.params["image_encoder"] = tower_params
    if tower_stats:
        b.batch_stats["image_encoder"] = tower_stats
    b.consumed.update(
        k for k in sd if k.startswith("image_encoder.model.")
    )
    _import_projection(b, sd, "image_projection", "image_projection")
    _import_projection(b, sd, "spot_projection", "spot_projection")
    return _finish(b, sd)
