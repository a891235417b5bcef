"""DenseNet-121 image tower in flax (NHWC).

The reference's default image encoder (reference ``model.py:72-85``):
torchvision ``densenet121`` with the classifier stripped — i.e. the
``features`` trunk ending at ``norm5`` — followed by adaptive average
pooling. Note there is **no ReLU after norm5** in that path (torchvision's
own ``forward`` adds one, but the reference's ``Sequential(children[:-1])``
bypasses it); we reproduce that exactly. Output dim: 1024.

Architecture (densenet121): init features 64, growth 32, bn_size 4, blocks
(6, 12, 24, 16); each dense layer is BN-ReLU-Conv1x1(4k)-BN-ReLU-Conv3x3(k)
with feature concatenation; transitions halve channels and avg-pool /2.

Dense connectivity is implemented by accumulating features in one NHWC
buffer per block — XLA turns the concats into contiguous HBM writes, and
each 1x1 conv is a single MXU matmul over H*W rows.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mclstexp_tpu.models.image.common import (
    BatchNormT,
    conv_kaiming_init,
    global_avg_pool,
    max_pool_3x3_s2,
)

Dtype = Any


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = BatchNormT(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="norm1",
        )(x)
        h = nn.relu(h)
        h = nn.Conv(
            self.bn_size * self.growth_rate, (1, 1), use_bias=False,
            kernel_init=conv_kaiming_init, dtype=self.dtype, name="conv1",
        )(h)
        h = BatchNormT(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="norm2",
        )(h)
        h = nn.relu(h)
        h = nn.Conv(
            self.growth_rate, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            kernel_init=conv_kaiming_init, dtype=self.dtype, name="conv2",
        )(h)
        return h


class _SlicedBN(nn.Module):
    """BatchNormT over a channel RANGE of a (total,)-channel param set.

    Lets the piecewise dense layer normalize each feature piece against the
    same parameters/stats a concat-input BatchNorm would hold — channels
    are disjoint across pieces, so per-piece batch statistics (and their
    sliced EMA updates) are mathematically identical to normalizing the
    concatenated input. Param/stat names match BatchNormT, so the tree is
    bit-compatible with the concat implementation.
    """

    total: int
    use_running_average: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, piece: jax.Array, offset: int) -> jax.Array:
        c = piece.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (self.total,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.total,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.total, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.total, jnp.float32)
        )
        sl = slice(offset, offset + c)
        if self.use_running_average:
            mean, var = ra_mean.value[sl], ra_var.value[sl]
        else:
            x32 = piece.astype(jnp.float32)
            axes = tuple(range(piece.ndim - 1))
            n = piece.size // c
            mean = jnp.mean(x32, axis=axes)
            # two-pass form, as in BatchNormT (E[x^2]-E[x]^2 cancels in fp32)
            var = jnp.mean(jnp.square(x32 - mean), axis=axes)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                # jnp.asarray: callers may seed batch_stats with NumPy
                # arrays (torch import), which lack the .at update API.
                rm = jnp.asarray(ra_mean.value)
                rv = jnp.asarray(ra_var.value)
                ra_mean.value = rm.at[sl].set(
                    self.momentum * rm[sl] + (1.0 - self.momentum) * mean
                )
                ra_var.value = rv.at[sl].set(
                    self.momentum * rv[sl] + (1.0 - self.momentum) * unbiased
                )
        inv = jax.lax.rsqrt(var + self.epsilon) * scale[sl]
        y = (piece.astype(jnp.float32) - mean) * inv + bias[sl]
        return y.astype(self.dtype)


class _SlicedConv1x1(nn.Module):
    """1x1 conv over a virtual concatenated input, evaluated piecewise.

    Holds ONE (1, 1, total_in, features) kernel (name/shape/init identical
    to the concat path's nn.Conv) and computes
    ``sum_j piece_j @ kernel[off_j:off_j+c_j]`` — the same contraction as
    conv1x1(concat(pieces)) with the channel reduction re-associated, so
    the per-layer prefix concat never materializes.
    """

    features: int
    total_in: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pieces) -> jax.Array:  # [(piece, offset)]
        kernel = self.param(
            "kernel", conv_kaiming_init,
            (1, 1, self.total_in, self.features), jnp.float32,
        )
        out = None
        for piece, off in pieces:
            k = kernel[0, 0, off : off + piece.shape[-1]].astype(self.dtype)
            part = jnp.einsum(
                "bhwc,cf->bhwf", piece, k, preferred_element_type=self.dtype
            )
            out = part if out is None else out + part
        return out


class DenseLayerP(nn.Module):
    """DenseLayer evaluated on the un-concatenated feature pieces.

    Identical parameter tree (and init values) to DenseLayer; only the
    norm1-relu-conv1 stage is decomposed per piece.
    """

    growth_rate: int
    bn_size: int
    total_in: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pieces, train: bool = False) -> jax.Array:
        bn1 = _SlicedBN(
            self.total_in, use_running_average=not train, dtype=self.dtype,
            name="norm1",
        )
        conv1 = _SlicedConv1x1(
            self.bn_size * self.growth_rate, self.total_in, self.dtype,
            name="conv1",
        )
        h = conv1([(nn.relu(bn1(p, off)), off) for p, off in pieces])
        h = BatchNormT(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="norm2",
        )(h)
        h = nn.relu(h)
        return nn.Conv(
            self.growth_rate, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            kernel_init=conv_kaiming_init, dtype=self.dtype, name="conv2",
        )(h)


class DenseBlock(nn.Module):
    num_layers: int
    growth_rate: int
    bn_size: int
    dtype: Dtype = jnp.float32
    remat: bool = False
    # Dense-connectivity materialization strategy (numerics identical):
    #   "piecewise[<m>]" — never materialize the per-layer prefix concat;
    #       each layer's norm1-relu-conv1 runs piece-by-piece against
    #       channel-sliced params (DenseLayerP) and only the block OUTPUT
    #       concatenates once. With a bundle size m, every m new pieces
    #       merge into one contiguous buffer (each written ONCE, unlike the
    #       concat impl's per-layer prefix copy) so the conv1 contraction
    #       depth stays MXU-friendly (m*32 vs 32). Same-chip A/B on the
    #       B=128 flagship (ms/step, PROFILE_r03.md): concat 67.8,
    #       piecewise 63.1, piecewise4 64.8, **piecewise8 60.2 (the
    #       shipping default** via ModelConfig.dense_block_impl),
    #       piecewise12 60.8, piecewise16 61.4.
    #   "concat" — re-concatenate the feature prefix each layer (torchvision
    #       semantics verbatim); XLA emits a fresh (B,H,W,C_i+k) copy per
    #       layer, priced at 8.2 ms/step of the B=128 flagship step
    #       (PROFILE_r02.md).
    #   "dus" — preallocate the block's final channel extent once and write
    #       each layer's k new channels in place via dynamic_update_slice;
    #       layer inputs are prefix slices of the one buffer. Measured
    #       net-NEGATIVE (105.6 ms/step): XLA materializes the buffer at its
    #       FULL final extent per layer instead of updating in place
    #       (PROFILE_r03.md) — kept as a documented rejection.
    block_impl: str = "concat"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # remat=True rematerializes each dense layer in the backward pass:
        # only the concat buffer (needed anyway) is saved, the per-layer
        # BN/ReLU/conv intermediates are recomputed. Measured NET-NEGATIVE
        # for step time on v5e at B=128 (82.5 vs 77.8 ms — recomputed
        # activations still round-trip HBM; PROFILE_r02.md); useful only
        # when HBM capacity, not time, is the limit (larger B or towers).
        if self.block_impl.startswith("piecewise") and not self.remat:
            # remat=True falls through to the remat-wired concat path below:
            # rematerialization exists for HBM *capacity* (its whole point is
            # saving only the concat buffer and recomputing the per-layer
            # intermediates), so the concat materialization is what gets
            # checkpointed; a rematerialized piecewise form would need the
            # piece offsets lifted to static module state and saves nothing
            # the concat buffer doesn't.
            # Never materialize the per-layer prefix concat: each layer's
            # BN-relu-conv1 contraction runs piece-by-piece against sliced
            # params (see DenseLayerP); only the block OUTPUT concatenates,
            # once, for the transition. Param tree identical to "concat".
            #
            # "piecewise<m>" (e.g. "piecewise4") additionally BUNDLES every
            # m new feature pieces into one contiguous buffer as they are
            # produced: each bundle writes its m*k channels to HBM exactly
            # once (unlike the concat impl's per-layer full-prefix copy)
            # and raises the conv1 contraction depth from k=32 to m*32,
            # recovering MXU lane utilization the pure piecewise form gives
            # up. Pieces stay contiguous channel ranges, so the sliced
            # params/stats and per-channel BN statistics are unchanged.
            bundle = int(self.block_impl[len("piecewise"):] or 1)
            pieces = [(x.astype(self.dtype), 0)]
            tail = 0  # trailing growth-rate-wide pieces not yet bundled
            c = x.shape[-1]
            for i in range(self.num_layers):
                new = DenseLayerP(
                    self.growth_rate, self.bn_size, total_in=c,
                    dtype=self.dtype, name=f"denselayer{i + 1}",
                )(pieces, train)
                pieces.append((new.astype(self.dtype), c))
                c += self.growth_rate
                tail += 1
                if bundle > 1 and tail == bundle:
                    merged = jnp.concatenate(
                        [p for p, _ in pieces[-bundle:]], axis=-1
                    )
                    pieces = pieces[:-bundle] + [(merged, pieces[-bundle][1])]
                    tail = 0
            return jnp.concatenate([p for p, _ in pieces], axis=-1)

        layer_cls = (
            nn.remat(DenseLayer, static_argnums=(2,)) if self.remat else DenseLayer
        )
        layers = [
            layer_cls(
                self.growth_rate, self.bn_size, self.dtype, name=f"denselayer{i + 1}"
            )
            for i in range(self.num_layers)
        ]
        if self.block_impl == "dus":
            c0 = x.shape[-1]
            total = c0 + self.num_layers * self.growth_rate
            buf = jnp.zeros((*x.shape[:-1], total), self.dtype)
            buf = jax.lax.dynamic_update_slice_in_dim(
                buf, x.astype(self.dtype), 0, axis=-1
            )
            c = c0
            for layer in layers:
                cur = jax.lax.slice_in_dim(buf, 0, c, axis=-1)
                new = layer(cur, train).astype(self.dtype)
                buf = jax.lax.dynamic_update_slice_in_dim(buf, new, c, axis=-1)
                c += self.growth_rate
            return buf
        for layer in layers:
            new = layer(x, train)
            x = jnp.concatenate([x, new], axis=-1)
        return x


class Transition(nn.Module):
    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = BatchNormT(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="norm",
        )(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.out_features, (1, 1), use_bias=False,
            kernel_init=conv_kaiming_init, dtype=self.dtype, name="conv",
        )(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNetEncoder(nn.Module):
    """DenseNet feature tower -> (B, num_features) pooled vector."""

    block_config: Sequence[int] = (6, 12, 24, 16)  # densenet121
    growth_rate: int = 32
    bn_size: int = 4
    init_features: int = 64
    dtype: Dtype = jnp.float32
    remat: bool = False  # rematerialize dense layers in backward (see DenseBlock)
    block_impl: str = "concat"  # dense-connectivity strategy (see DenseBlock)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = x.astype(self.dtype)
        x = nn.Conv(
            self.init_features, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            use_bias=False, kernel_init=conv_kaiming_init, dtype=self.dtype,
            name="conv0",
        )(x)
        x = BatchNormT(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="norm0",
        )(x)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)

        features = self.init_features
        for i, num_layers in enumerate(self.block_config):
            x = DenseBlock(
                num_layers, self.growth_rate, self.bn_size, self.dtype,
                remat=self.remat, block_impl=self.block_impl,
                name=f"denseblock{i + 1}",
            )(x, train)
            features += num_layers * self.growth_rate
            if i != len(self.block_config) - 1:
                features = features // 2
                x = Transition(features, self.dtype, name=f"transition{i + 1}")(x, train)

        x = BatchNormT(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="norm5",
        )(x)
        # NOTE: no ReLU here — reference model.py:76 strips torchvision's
        # classifier-path ReLU. Pool straight off norm5.
        return global_avg_pool(x).astype(jnp.float32)


def densenet121(
    dtype=jnp.float32, remat: bool = False, block_impl: str = "concat"
) -> DenseNetEncoder:
    return DenseNetEncoder(dtype=dtype, remat=remat, block_impl=block_impl)


def tiny_densenet(
    dtype=jnp.float32, remat: bool = False, block_impl: str = "concat"
) -> DenseNetEncoder:
    """Miniature DenseNet (2+2 layers, 16-d features) exercising the exact
    densenet121 code paths — dense connectivity, transitions, every
    block_impl — at test scale."""
    return DenseNetEncoder(
        block_config=(2, 2), growth_rate=4, bn_size=2, init_features=8,
        dtype=dtype, remat=remat, block_impl=block_impl,
    )
