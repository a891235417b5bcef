"""Shared building blocks for the image towers (NHWC, TPU-native).

Initialization follows torchvision's CNN conventions (kaiming-normal
fan-out for convs, BN gamma=1 beta=0) so that from-scratch training matches
the reference's initialization statistics when pretrained weights are not
supplied. BatchNorm uses torch semantics (eps 1e-5, momentum 0.1 on the
running stats, i.e. flax momentum 0.9).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

conv_kaiming_init = jax.nn.initializers.variance_scaling(
    2.0, "fan_out", "truncated_normal"
)


class BatchNormT(nn.Module):
    """BatchNorm with exact torch running-stat semantics.

    flax ``nn.BatchNorm`` folds the *biased* batch variance into the running
    EMA; torch stores the UNBIASED (ddof=1) batch variance in
    ``running_var`` while normalizing with the biased one
    (torch BatchNorm2d docs; F.batch_norm). The per-step offset is only
    batch_var/(n-1), but it is systematic — the reference A/B trajectory
    test caught it as a running-var drift — so the towers use this module
    for bit-faithful train->eval parity. Normalization math matches
    nn.BatchNorm (fp32 statistics, eps 1e-5, momentum 0.1 torch == 0.9 EMA).
    """

    use_running_average: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        """mask: optional (N,) bool over the LEADING axis — batch statistics
        (and the running-stat update) are computed over the masked samples
        only. This is what makes the slide baselines' pad-to-bucket scheme
        EXACT in train mode: the per-patch conv trunks touch other samples
        only through BN statistics, so masking them out makes the padded
        forward equal the unpadded one on every real row (the reference
        trains unpadded dynamic-shape slides). No-op at eval (running
        stats)."""
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(c, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(c, jnp.float32)
        )
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            x32 = x.astype(jnp.float32)
            reduce_axes = tuple(range(x.ndim - 1))
            # Two-pass variance (mean of squared deviations), torch's form.
            # E[x^2] - E[x]^2 cancels catastrophically in fp32 for
            # large-magnitude low-variance activations (e.g. visium's raw
            # 0-255 inputs) and can even go negative -> rsqrt NaN.
            if mask is None:
                n = x.size // c
                mean = jnp.mean(x32, axis=reduce_axes)
                var = jnp.mean(jnp.square(x32 - mean), axis=reduce_axes)
            else:
                w = mask.astype(jnp.float32).reshape(
                    (x.shape[0],) + (1,) * (x.ndim - 1)
                )
                per_sample = x.size // c // x.shape[0]  # spatial elems/sample
                n = jnp.maximum(jnp.sum(w) * per_sample, 1.0)
                mean = jnp.sum(x32 * w, axis=reduce_axes) / n
                var = jnp.sum(jnp.square(x32 - mean) * w, axis=reduce_axes) / n
            if not self.is_initializing():
                unbiased = var * (n / jnp.maximum(n - 1, 1))
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1.0 - self.momentum) * unbiased
                )
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(self.dtype)


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
        x = BatchNormT(
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
