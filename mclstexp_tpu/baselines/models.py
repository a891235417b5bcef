"""The four baseline model families as flax modules over the shared data
layer (SURVEY §2.2). All slide-level models take one whole section — patches
(N, P, P, 3), array coords (N, 2), dense adjacency where used — and emit
(N, G) expression predictions; BLEEP is per-spot contrastive like the
flagship model.

  * ``HisToGene`` (reference ``baselines/HisToGene/vis_model.py:144-191``):
    flattened-pixel linear patch embedding + x/y Embedding(64) + 8-head ViT
    + LayerNorm/Linear gene head; MSE on the slide.
  * ``Hist2ST`` (``baselines/His2ST/HIST2ST.py:85-199``): conv patchify ->
    convmixer blocks -> channel-down flatten -> transformer over spots (+pos)
    -> GraphSAGE x depth3 with LSTM jump-knowledge -> gene head; aux NB/ZINB
    heads on raw counts and self-distillation over augmented "bakes".
  * ``THItoGene`` (``baselines/THItoGene/vis_model.py:153-207``): ODConv
    patchify -> EfficientCapsNet -> capsule+pos token sequence -> ViT ->
    multi-head GAT over the spot graph -> gene head.
  * ``BLEEP`` (``baselines/Bleep/models.py:9-43``): image tower + projection
    heads on raw expression, CLIP loss with intra-modal soft targets.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mclstexp_tpu.baselines.layers import (
    ConvMixerBlock,
    EfficientCapsNet,
    GraphSAGEBlock,
    MultiHeadGAT,
    ODConv,
)
from mclstexp_tpu.baselines.losses import disp_act, mean_act
from mclstexp_tpu.core.layers import (
    AttnBlock,
    DenseT,
    LayerNormT,
    PositionTables,
    ProjectionHead,
    torch_embed_init,
)
from mclstexp_tpu.models.image.registry import build_encoder

Dtype = Any


class SpotViT(nn.Module):
    """The baselines' shared slide-level transformer: emb dropout + depth x
    pre-LN blocks, dim_head 64, no cls token / no final LN
    (reference ``baselines/HisToGene/transformer.py:66-92``)."""

    dim: int
    depth: int
    heads: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    backend: str = "xla"  # "flash" streams whole-slide sequences on TPU
    emb_dropout: Optional[float] = None  # None -> same as dropout (reference
    # ViT default); Hist2ST applies its emb dropout EARLIER (HIST2ST.py:72-73,
    # before the convmixer trunk), so it passes 0.0 here

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True, mask=None
    ) -> jax.Array:
        emb_drop = self.dropout if self.emb_dropout is None else self.emb_dropout
        x = nn.Dropout(emb_drop)(x, deterministic=deterministic)
        for i in range(self.depth):
            x = AttnBlock(
                self.dim, self.heads, 64, self.mlp_dim, self.dropout, self.dtype,
                self.backend, name=f"block{i}",
            )(x, deterministic, mask)
        return x


class HisToGene(nn.Module):
    n_genes: int
    patch_size: int = 112
    dim: int = 1024
    n_layers: int = 4
    heads: int = 16
    n_pos: int = 64
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    attn_backend: str = "xla"

    @nn.compact
    def __call__(
        self,
        patches: jax.Array,  # (N, P, P, 3) float [0,1]
        positions: jax.Array,  # (N, 2) int array coords
        train: bool = False,
        mask: Optional[jax.Array] = None,  # (N,) validity for padded slides
    ) -> jax.Array:
        n = patches.shape[0]
        flat = patches.reshape(n, -1)  # (N, 3*P*P) pixel flatten
        x = DenseT(self.dim, dtype=self.dtype, name="patch_embedding")(flat)
        x = x + PositionTables(self.n_pos, self.dim, name="pos")(positions)
        x = SpotViT(
            self.dim, self.n_layers, self.heads, 2 * self.dim, self.dropout,
            self.dtype, self.attn_backend, name="vit",
        )(x[None], deterministic=not train, mask=mask)[0]
        x = LayerNormT(dtype=self.dtype, name="head_norm")(x)
        return DenseT(self.n_genes, dtype=self.dtype, name="gene_head")(x).astype(
            jnp.float32
        )


class Hist2ST(nn.Module):
    n_genes: int
    fig_size: int = 112
    patch_size: int = 7  # conv patchify kernel/stride
    channel: int = 32
    kernel_size: int = 5
    depth1: int = 2  # convmixer blocks
    depth2: int = 8  # transformer blocks
    depth3: int = 4  # GraphSAGE blocks
    heads: int = 16
    n_pos: int = 64
    dropout: float = 0.2
    zinb: bool = True  # emit ZINB heads
    nb: bool = False  # NB parameterization instead of ZINB
    coef_head: bool = False  # bake-distillation weighting head (HIST2ST.py:125-129)
    dtype: Dtype = jnp.float32
    attn_backend: str = "xla"

    @property
    def dim(self) -> int:
        return (self.fig_size // self.patch_size) ** 2 * self.channel // 8

    @nn.compact
    def __call__(
        self,
        patches: jax.Array,  # (N, P, P, 3)
        positions: jax.Array,  # (N, 2)
        adj: jax.Array,  # (N, N) dense 0/1
        train: bool = False,
        mask: Optional[jax.Array] = None,
        aug: bool = False,  # bake pass: third output becomes coef(h), not h
        # (reference HIST2ST.py:138-141); init with aug=True to create the head
    ) -> Tuple[jax.Array, Optional[tuple], jax.Array]:
        n = patches.shape[0]
        dim = self.dim
        x = nn.Conv(
            self.channel, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            dtype=self.dtype, name="patch_embedding",
        )(patches.astype(self.dtype))
        # Reference ViT.forward applies its emb dropout to the conv feature
        # map BEFORE the mixer trunk (HIST2ST.py:72-73,55-56), not to the
        # spot tokens; match that placement.
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        for i in range(self.depth1):
            # mask -> BN statistics over real spots only: keeps the padded
            # slide's train-mode forward exactly equal to the unpadded one
            x = ConvMixerBlock(
                self.channel, self.kernel_size, self.dtype, name=f"mixer{i}"
            )(x, train, mask)
        x = nn.Conv(self.channel // 8, (1, 1), dtype=self.dtype, name="down")(x)
        # Flatten in (c, h, w) order — the reference's nn.Flatten on an NCHW
        # tensor (HIST2ST.py:50-53) — so the token feature basis (and thus
        # every downstream weight: pos tables, attention, GraphSAGE, LSTM,
        # heads) matches torch checkpoints element-for-element.
        g = x.transpose(0, 3, 1, 2).reshape(n, dim)  # per-spot token

        ct = PositionTables(self.n_pos, dim, name="pos")(positions)
        g = SpotViT(
            dim, self.depth2, self.heads, dim, self.dropout, self.dtype,
            self.attn_backend, name="vit", emb_dropout=0.0,
        )((g + ct)[None], deterministic=not train, mask=mask)[0]

        # GraphSAGE stack with LSTM jump-knowledge over the depth outputs
        jk = []
        for i in range(self.depth3):
            g = GraphSAGEBlock(dim, gcn=True, dtype=self.dtype, name=f"gs{i}")(g, adj)
            jk.append(g)
        stacked = jnp.stack(jk, axis=0)  # (depth3, N, dim) — LSTM over depth
        # cells named explicitly: a cell passed into nn.RNN registers as a
        # child of THIS module, so without names the params would land at
        # fragile auto-paths (OptimizedLSTMCell_0/1)
        lstm = nn.RNN(nn.OptimizedLSTMCell(dim, name="jknet_cell"), name="jknet")
        h = lstm(stacked.transpose(1, 0, 2)).transpose(1, 0, 2)
        # second LSTM layer (reference nn.LSTM(dim, dim, 2))
        lstm2 = nn.RNN(nn.OptimizedLSTMCell(dim, name="jknet2_cell"), name="jknet2")
        h = lstm2(h.transpose(1, 0, 2)).transpose(1, 0, 2)
        h = jnp.mean(h, axis=0)  # (N, dim)

        norm = LayerNormT(dtype=self.dtype, name="head_norm")(h)
        pred = DenseT(self.n_genes, dtype=self.dtype, name="gene_head")(norm).astype(
            jnp.float32
        )

        extra = None
        if self.zinb:
            if self.nb:
                r = DenseT(self.n_genes, dtype=self.dtype, name="hr")(h)
                p = DenseT(self.n_genes, dtype=self.dtype, name="hp")(h)
                extra = (r.astype(jnp.float32), p.astype(jnp.float32))
            else:
                m = mean_act(DenseT(self.n_genes, dtype=self.dtype, name="mean")(h).astype(jnp.float32))
                d = disp_act(DenseT(self.n_genes, dtype=self.dtype, name="disp")(h).astype(jnp.float32))
                pi = jax.nn.sigmoid(DenseT(self.n_genes, dtype=self.dtype, name="pi")(h).astype(jnp.float32))
                extra = (m, d, pi)
        if self.coef_head and aug:
            # distillation weighting head: Linear -> ReLU -> Linear(1)
            # (reference HIST2ST.py:125-129,138-141 replaces h by coef(h)
            # on augmented "bake" passes; softmax over bakes in the trainer)
            c = DenseT(self.dim, dtype=self.dtype, name="coef_fc1")(h)
            c = DenseT(1, dtype=self.dtype, name="coef_fc2")(nn.relu(c))
            return pred, extra, c.astype(jnp.float32)
        return pred, extra, h


class THItoGene(nn.Module):
    n_genes: int
    patch_size: int = 112
    dim: int = 1024
    n_layers: int = 4
    caps: int = 20
    route_dim: int = 64
    heads: Tuple[int, int] = (16, 8)
    n_pos: int = 64
    dropout: float = 0.2
    dtype: Dtype = jnp.float32
    attn_backend: str = "xla"

    @nn.compact
    def __call__(
        self,
        patches: jax.Array,  # (N, 112, 112, 3)
        positions: jax.Array,  # (N, 2)
        adj: jax.Array,  # (N, N)
        train: bool = False,
        mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        n = patches.shape[0]
        # mask -> BN statistics over real spots only (pad-exact train mode)
        x = ODConv(16, 4, 4, dtype=self.dtype, name="odconv")(
            patches.astype(self.dtype), train, mask
        )
        x = nn.relu(x)
        caps = EfficientCapsNet(self.caps, self.route_dim, self.dtype, name="caps")(
            x, train, mask
        )  # (N, caps, route_dim)

        px = self.param(
            "x_embed", torch_embed_init, (self.n_pos, self.route_dim), jnp.float32
        )
        py = self.param(
            "y_embed", torch_embed_init, (self.n_pos, self.route_dim), jnp.float32
        )
        pos = positions.astype(jnp.int32)
        cx = jnp.take(px, pos[:, 0], axis=0)[:, None, :]  # (N, 1, route_dim)
        cy = jnp.take(py, pos[:, 1], axis=0)[:, None, :]
        tokens = jnp.concatenate([caps, cx, cy], axis=1)  # (N, caps+2, route_dim)
        seq = tokens.reshape(1, n, (self.caps + 2) * self.route_dim)

        seq = SpotViT(
            (self.caps + 2) * self.route_dim, self.n_layers, self.heads[0],
            2 * self.dim, self.dropout, self.dtype, self.attn_backend, name="vit",
        )(seq, deterministic=not train, mask=mask)[0]

        g = MultiHeadGAT(
            nhid=1024, out_features=512, heads=self.heads[1],
            dropout=self.dropout, alpha=0.01, dtype=self.dtype, name="gat",
        )(seq, adj, deterministic=not train, mask=mask)

        h = DenseT(1024, dtype=self.dtype, name="head_fc1")(g)
        h = nn.relu(h)
        h = LayerNormT(dtype=self.dtype, name="head_norm")(h)
        return DenseT(self.n_genes, dtype=self.dtype, name="head_fc2")(h).astype(
            jnp.float32
        )


class BLEEP(nn.Module):
    """CLIP model: image tower + two projection heads; raw expression is the
    spot feature (no spot encoder). Loss lives in baselines.losses."""

    spot_dim: int
    encoder_name: str = "resnet50"
    projection_dim: int = 256
    dropout: float = 0.1
    temperature: float = 1.0
    dtype: Dtype = jnp.float32

    def setup(self):
        encoder, feat_dim = build_encoder(self.encoder_name, dtype=self.dtype)
        self.image_encoder = encoder
        self.image_projection = ProjectionHead(
            self.projection_dim, self.dropout, dtype=self.dtype, name="image_projection"
        )
        self.spot_projection = ProjectionHead(
            self.projection_dim, self.dropout, dtype=self.dtype, name="spot_projection"
        )

    def __call__(
        self, batch, train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        feats = self.image_encoder(batch["image"], train=train)
        image_emb = self.image_projection(feats, deterministic=not train)
        spot_emb = self.spot_projection(
            batch["expression"], deterministic=not train
        )
        return image_emb.astype(jnp.float32), spot_emb.astype(jnp.float32)
