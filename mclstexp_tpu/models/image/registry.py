"""Image-tower registry: encoder_name -> (flax module, feature dim).

Mirrors the reference's string-dispatched encoder selection
(reference ``model.py:206-215``) with the same names, plus a test tower.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from mclstexp_tpu.models.image.densenet import densenet121, tiny_densenet
from mclstexp_tpu.models.image.resnet import resnet18, resnet50, resnet101, resnet152
from mclstexp_tpu.models.image.vit import TinyCNN, clip_vit_b32, vit_b32, vit_l32

ENCODERS = {
    "densenet121": (densenet121, 1024),
    "resnet50": (resnet50, 2048),
    "res101": (resnet101, 2048),
    "res18": (resnet18, 512),
    "vit": (vit_b32, 768),
    # BLEEP's wider encoder menu (reference baselines/Bleep/modules.py:7-132)
    "resnet152": (resnet152, 2048),
    "vit_l": (vit_l32, 1024),
    "clip_vit": (clip_vit_b32, 768),
    "tiny_cnn": (lambda dtype=jnp.float32: TinyCNN(dtype=dtype), 128),
    "tiny_densenet": (tiny_densenet, 16),  # test tower: densenet code paths
}


# Towers where per-layer rematerialization is wired (saves activation HBM
# capacity for larger batches/towers; measured slower for step time at the
# flagship shapes — see models/image/densenet.py:DenseBlock).
REMAT_CAPABLE = {"densenet121", "tiny_densenet"}
# Towers that consume the dense-block materialization knob.
DENSE_IMPL_CAPABLE = {"densenet121", "tiny_densenet"}


def build_encoder(
    name: str, dtype=jnp.float32, remat: bool = False, block_impl: str = "concat"
) -> Tuple[nn.Module, int]:
    if name not in ENCODERS:
        raise KeyError(f"unknown image encoder {name!r}; have {sorted(ENCODERS)}")
    factory, dim = ENCODERS[name]
    kw = {}
    if remat and name in REMAT_CAPABLE:
        kw["remat"] = True
    if name in DENSE_IMPL_CAPABLE and block_impl != "concat":
        kw["block_impl"] = block_impl  # DenseBlock materialization strategy
    return factory(dtype=dtype, **kw), dim
