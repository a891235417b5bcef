"""ResNet image towers (18/50/101) in flax (NHWC).

Alternative encoders selectable by name (reference ``model.py:88-148``,
``model.py:206-215``): torchvision resnet with the fc head stripped and
global average pooling. Output dims: 512 (r18), 2048 (r50/r101).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mclstexp_tpu.models.image.common import (
    ConvBN,
    global_avg_pool,
    max_pool_3x3_s2,
)

Dtype = Any


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        identity = x
        h = ConvBN(self.features, (3, 3), (self.strides, self.strides),
                   ((1, 1), (1, 1)), relu=True, dtype=self.dtype, name="cb1")(x, train)
        h = ConvBN(self.features, (3, 3), (1, 1), ((1, 1), (1, 1)),
                   relu=False, dtype=self.dtype, name="cb2")(h, train)
        if self.strides != 1 or x.shape[-1] != self.features:
            identity = ConvBN(self.features, (1, 1), (self.strides, self.strides),
                              "VALID", relu=False, dtype=self.dtype,
                              name="downsample")(x, train)
        return nn.relu(h + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        identity = x
        out_features = self.features * 4
        h = ConvBN(self.features, (1, 1), (1, 1), "VALID", relu=True,
                   dtype=self.dtype, name="cb1")(x, train)
        h = ConvBN(self.features, (3, 3), (self.strides, self.strides),
                   ((1, 1), (1, 1)), relu=True, dtype=self.dtype, name="cb2")(h, train)
        h = ConvBN(out_features, (1, 1), (1, 1), "VALID", relu=False,
                   dtype=self.dtype, name="cb3")(h, train)
        if self.strides != 1 or x.shape[-1] != out_features:
            identity = ConvBN(out_features, (1, 1), (self.strides, self.strides),
                              "VALID", relu=False, dtype=self.dtype,
                              name="downsample")(x, train)
        return nn.relu(h + identity)


class ResNetEncoder(nn.Module):
    stage_sizes: Sequence[int]
    block: str = "bottleneck"  # "basic" | "bottleneck"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = x.astype(self.dtype)
        x = ConvBN(64, (7, 7), (2, 2), ((3, 3), (3, 3)), relu=True,
                   dtype=self.dtype, name="stem")(x, train)
        x = max_pool_3x3_s2(x)
        block_cls = Bottleneck if self.block == "bottleneck" else BasicBlock
        for stage, num_blocks in enumerate(self.stage_sizes):
            features = 64 * (2**stage)
            for b in range(num_blocks):
                strides = 2 if (b == 0 and stage > 0) else 1
                x = block_cls(features, strides, self.dtype,
                              name=f"layer{stage + 1}_block{b}")(x, train)
        return global_avg_pool(x).astype(jnp.float32)


def resnet18(dtype=jnp.float32):
    return ResNetEncoder(stage_sizes=(2, 2, 2, 2), block="basic", dtype=dtype)


def resnet50(dtype=jnp.float32):
    return ResNetEncoder(stage_sizes=(3, 4, 6, 3), block="bottleneck", dtype=dtype)


def resnet101(dtype=jnp.float32):
    return ResNetEncoder(stage_sizes=(3, 4, 23, 3), block="bottleneck", dtype=dtype)


def resnet152(dtype=jnp.float32):
    """BLEEP's deepest resnet option (reference
    ``baselines/Bleep/modules.py:60-74``)."""
    return ResNetEncoder(stage_sizes=(3, 8, 36, 3), block="bottleneck", dtype=dtype)
