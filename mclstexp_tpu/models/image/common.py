"""Shared building blocks for the image towers (NHWC, TPU-native).

Initialization follows torchvision's CNN conventions (kaiming-normal
fan-out for convs, BN gamma=1 beta=0) so that from-scratch training matches
the reference's initialization statistics when pretrained weights are not
supplied. BatchNorm uses torch semantics (eps 1e-5, momentum 0.1 on the
running stats, i.e. flax momentum 0.9).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

conv_kaiming_init = jax.nn.initializers.variance_scaling(
    2.0, "fan_out", "truncated_normal"
)


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm, optionally followed by ReLU."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=self.padding,
            use_bias=False,
            kernel_init=conv_kaiming_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.relu:
            x = nn.relu(x)
        return x


def global_avg_pool(x: jax.Array) -> jax.Array:
    """Adaptive average pool to (1, 1) then flatten: (B, H, W, C) -> (B, C)."""
    return jnp.mean(x, axis=(1, 2))


def max_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """torch MaxPool2d(3, stride=2, padding=1)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
