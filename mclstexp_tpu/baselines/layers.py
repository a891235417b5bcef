"""Building blocks for the baseline model families (flax, NHWC).

  * ``ConvMixerBlock`` — Hist2ST's depthwise-conv mixer
    (reference ``baselines/His2ST/HIST2ST.py:14-33``).
  * ``GraphSAGEBlock`` — Hist2ST's dense-adjacency GraphSAGE layer with mean
    aggregation + L2 row normalization (``baselines/His2ST/gcn.py:12-53``).
  * ``GraphAttention`` / ``MultiHeadGAT`` — THItoGene's GAT
    (``baselines/THItoGene/GATLayer.py:6-61``), masked dense softmax.
  * ``ODConv`` — omni-dimensional dynamic convolution
    (``baselines/THItoGene/ODConv.py:86-141``): per-sample kernels built from
    four attention factors. For the stride==kernel (patchify) case used by
    THItoGene this lowers to a single batched einsum on the MXU instead of
    the reference's grouped-conv-with-reshaped-batch trick.
  * ``EfficientCapsNet`` pieces — squash + conv trunk + self-routing layer
    (``baselines/THItoGene/efficient_capsnet.py:6-92``).

All params fp32; compute dtype selectable.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mclstexp_tpu.models.image.common import BatchNormT, conv_kaiming_init

Dtype = Any

xavier_uniform = jax.nn.initializers.glorot_uniform()
# torch xavier_uniform_(gain=1.414) — the GAT init
xavier_uniform_gain_1414 = jax.nn.initializers.variance_scaling(
    2.0, "fan_avg", "uniform"
)


class ConvMixerBlock(nn.Module):
    dim: int
    kernel_size: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        # mask: (N,) sample validity — masked BN statistics keep the
        # pad-to-bucket scheme exact in train mode (see BatchNormT)
        def dw_unit(h, name):
            h = nn.Conv(
                self.dim, (self.kernel_size, self.kernel_size), padding="SAME",
                feature_group_count=self.dim, dtype=self.dtype, name=f"{name}_conv",
            )(h)
            h = BatchNormT(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=f"{name}_bn",
            )(h, mask)
            return nn.gelu(h, approximate=False)

        h = dw_unit(x, "dw1")
        h = dw_unit(h, "dw2")
        x = h + x
        x = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="pw_conv")(x)
        x = nn.gelu(x, approximate=False)
        x = BatchNormT(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="pw_bn",
        )(x, mask)
        return x


class GraphSAGEBlock(nn.Module):
    """Mean-aggregate neighbors (dense adjacency matmul), linear, ReLU,
    L2-normalize rows. gcn=True uses neighbor features only (Hist2ST's
    configuration); gcn=False concatenates self features."""

    embed_dim: int
    gcn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, adj: jax.Array) -> jax.Array:
        a = adj
        if not self.gcn:
            a = a - jnp.eye(a.shape[0], dtype=a.dtype)
        deg = jnp.sum(a, axis=1, keepdims=True)
        neigh = (a / jnp.where(deg == 0, 1.0, deg)) @ x  # (N, F) mean aggregate
        combined = neigh if self.gcn else jnp.concatenate([x, neigh], axis=1)
        h = nn.Dense(
            self.embed_dim, use_bias=False, kernel_init=xavier_uniform,
            dtype=self.dtype, name="weight",
        )(combined)
        h = nn.relu(h)
        norm = jnp.linalg.norm(h, axis=1, keepdims=True)
        return h / jnp.maximum(norm, 1e-12)


class GraphAttention(nn.Module):
    out_features: int
    dropout: float = 0.2
    alpha: float = 0.01
    concat: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, h: jax.Array, adj: jax.Array, deterministic: bool = True,
        mask: "jax.Array | None" = None,
    ) -> jax.Array:
        wh = nn.Dense(
            self.out_features, use_bias=False,
            kernel_init=xavier_uniform_gain_1414, dtype=self.dtype, name="W",
        )(h)
        a = self.param(
            "a", xavier_uniform_gain_1414, (2 * self.out_features, 1), jnp.float32
        )
        e1 = wh @ a[: self.out_features]
        e2 = wh @ a[self.out_features :]
        e = nn.leaky_relu(e1 + e2.T, negative_slope=self.alpha)
        e = jnp.where(adj > 0, e, -9e15)
        if mask is not None:
            # Pad COLUMNS get a strictly lower fill than non-neighbors: an
            # isolated real spot (all-zero adjacency row — possible under
            # prune='grid' at tissue edges) degrades to a uniform softmax
            # over the -9e15 entries, and without this it would attend
            # uniformly over PAD tokens too, breaking pad-equivalence
            # (reference GATLayer.py softmaxes over real spots only because
            # it never pads). Finite fill (not -inf) so all-pad rows stay
            # NaN-free.
            e = jnp.where(mask[None, :], e, -1e30)
        attn = jax.nn.softmax(e, axis=1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = attn @ wh
        return nn.elu(out) if self.concat else out


class MultiHeadGAT(nn.Module):
    nhid: int
    out_features: int
    heads: int = 4
    dropout: float = 0.2
    alpha: float = 0.01
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, adj: jax.Array, deterministic: bool = True,
        mask: "jax.Array | None" = None,
    ) -> jax.Array:
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        heads = [
            GraphAttention(
                self.nhid, self.dropout, self.alpha, True, self.dtype,
                name=f"attention_{i}",
            )(x, adj, deterministic, mask=mask)
            for i in range(self.heads)
        ]
        x = jnp.concatenate(heads, axis=1)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = GraphAttention(
            self.out_features, self.dropout, self.alpha, False, self.dtype,
            name="out_att",
        )(x, adj, deterministic, mask=mask)
        return nn.elu(x)


class ODConv(nn.Module):
    """Omni-dimensional dynamic conv, stride == kernel_size (patchify) case.

    Four attentions from the pooled input (channel, filter, spatial, kernel);
    the per-sample aggregate kernel contracts with non-overlapping patches in
    one einsum: (B, P, k*k*Cin) x (B, k*k*Cin, Cout) — MXU-shaped.
    """

    out_planes: int
    kernel_size: int
    stride: int
    kernel_num: int = 4
    reduction: float = 0.0625
    min_channel: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        assert self.stride == self.kernel_size, "patchify fast path only"
        b, h, w, cin = x.shape
        k, cout, kn = self.kernel_size, self.out_planes, self.kernel_num
        attn_ch = max(int(cin * self.reduction), self.min_channel)

        pooled = jnp.mean(x, axis=(1, 2))  # (B, Cin)
        f = nn.Dense(attn_ch, use_bias=False, kernel_init=conv_kaiming_init,
                     dtype=self.dtype, name="fc")(pooled)
        f = BatchNormT(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(f, mask)
        f = nn.relu(f)

        channel_attn = jax.nn.sigmoid(nn.Dense(cin, name="channel_fc")(f))  # (B, Cin)
        filter_attn = jax.nn.sigmoid(nn.Dense(cout, name="filter_fc")(f))  # (B, Cout)
        spatial_attn = jax.nn.sigmoid(
            nn.Dense(k * k, name="spatial_fc")(f)
        ).reshape(b, 1, k * k, 1)  # broadcast over kernels and channels
        kernel_attn = jax.nn.softmax(
            nn.Dense(kn, name="kernel_fc")(f), axis=-1
        )  # (B, Kn)

        weight = self.param(
            "weight", conv_kaiming_init, (kn, k * k * cin, cout), jnp.float32
        )  # reference stores (Kn, Cout, Cin, k, k); we keep matmul layout

        x = x * channel_attn[:, None, None, :]
        # non-overlapping patches: (B, H/k, k, W/k, k, Cin) -> (B, P, k*k*Cin)
        patches = x.reshape(b, h // k, k, w // k, k, cin)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(b, -1, k * k * cin)

        # per-sample aggregate kernel: sum over the Kn candidate kernels,
        # then modulate per spatial tap (broadcast over cin).
        spatial_full = jnp.repeat(spatial_attn, cin, axis=2)  # (B, 1, k*k*Cin, 1)
        agg = jnp.einsum(
            "bn,nsc->bsc",
            kernel_attn.astype(self.dtype),
            weight.astype(self.dtype),
        )  # (B, k*k*Cin, Cout)
        agg = agg * spatial_full[:, 0]

        out = jnp.einsum(
            "bps,bsc->bpc", patches.astype(self.dtype), agg,
            preferred_element_type=self.dtype,
        )
        out = out * filter_attn[:, None, :]
        return out.reshape(b, h // k, w // k, cout)


def squash(x: jax.Array, eps: float = 1e-20) -> jax.Array:
    """Efficient-CapsNet squash (efficient_capsnet.py:6-8)."""
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return (1.0 - 1.0 / (jnp.exp(n) + eps)) * (x / (n + eps))


class RoutingLayer(nn.Module):
    """Self-attention routing (efficient_capsnet.py:41-61)."""

    num_capsules: int
    dim_capsules: int
    in_caps: int = 16
    in_dim: int = 8

    @nn.compact
    def __call__(self, u_in: jax.Array) -> jax.Array:
        w = self.param(
            "W", conv_kaiming_init,
            (self.num_capsules, self.in_caps, self.in_dim, self.dim_capsules),
            jnp.float32,
        )
        b = self.param(
            "b", nn.initializers.zeros, (self.num_capsules, self.in_caps, 1), jnp.float32
        )
        u = jnp.einsum("...ji,kjiz->...kjz", u_in, w)  # (B, caps, in_caps, dim)
        c = jnp.einsum("...ij,...kj->...i", u, u)[..., None]
        c = c / jnp.sqrt(jnp.float32(self.dim_capsules))
        c = jax.nn.softmax(c, axis=1) + b
        s = jnp.sum(u * c, axis=-2)
        return squash(s)


class EfficientCapsNet(nn.Module):
    """Conv trunk + primary caps + routing (efficient_capsnet.py:64-92).
    Input (B, 28, 28, 16) from the ODConv patchify of a 112px patch."""

    rout_capsules: int
    route_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        def conv_bn(h, feat, k, stride, name):
            h = nn.Conv(feat, (k, k), strides=(stride, stride), padding="VALID",
                        kernel_init=conv_kaiming_init, dtype=self.dtype, name=f"{name}_conv")(h)
            h = BatchNormT(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name=f"{name}_bn")(h, mask)
            return nn.relu(h)

        x = conv_bn(x, 32, 5, 1, "c1")
        x = conv_bn(x, 64, 3, 1, "c2")
        x = conv_bn(x, 64, 3, 1, "c3")
        x = conv_bn(x, 128, 3, 2, "c4")
        # primary caps: depthwise 9x9 valid -> (B, 1, 1, 128) -> (B, 16, 8)
        x = nn.Conv(128, (9, 9), padding="VALID", feature_group_count=128,
                    dtype=self.dtype, name="primary_dw")(x)
        x = x.reshape(x.shape[0], 16, 8)
        x = squash(x)
        return RoutingLayer(self.rout_capsules, self.route_dim, name="digit_caps")(x)
