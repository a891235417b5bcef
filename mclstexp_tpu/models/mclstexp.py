"""Flagship contrastive model: image tower + spot tower + projection heads.

Covers both reference variants: the product model ``mclSTExp_Attention``
(reference ``model.py:201-247``) and the MLP ablation ``mclSTExp_MLP``
(``model.py:171-198``, no spot transformer).

Unlike the reference's loss-returning ``forward``, the flax module exposes
the towers functionally — ``__call__`` returns the pair of (B, P) projected
embeddings and the loss lives in ``core.losses`` — so the same apply works
for training (jitted loss+grad), embedding dumps, and sharded inference.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mclstexp_tpu.config import ModelConfig
from mclstexp_tpu.core.layers import PositionTables, ProjectionHead
from mclstexp_tpu.core.losses import symmetric_infonce
from mclstexp_tpu.models.image.registry import build_encoder
from mclstexp_tpu.models.spot import SpotEncoder


def _dtype_of(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


class MclSTExp(nn.Module):
    """Two-tower contrastive model.

    Inputs (matching the reference batch dict, ``dataset.py:208-240``):
      image:      (B, 224, 224, 3) float in [0, 1], NHWC
      expression: (B, G) log-CPM HVG expression
      position:   (B, 2) raw integer (x, y) coords

    Divergence (documented): ``config.dropout`` is LIVE here — it reaches
    the spot-encoder attention blocks and both projection heads. The
    reference's ``--dropout`` flag is dead code: ``mclSTExp_Attention``
    hardcodes ``dropout=0.`` in its spot attn_blocks and never forwards
    dropout to ``ProjectionHead`` (reference ``model.py:202,217-221``), so
    a reference run with --dropout 0.1 still trains dropout-free. The
    default (0.0) is bit-parity; nonzero values train the model the flag
    CLAIMS to train in the reference (quirk policy: dead code is not
    reproduced).
    """

    config: ModelConfig

    def setup(self):
        cfg = self.config
        dtype = _dtype_of(cfg)
        encoder, feat_dim = build_encoder(
            cfg.encoder_name, dtype=dtype, remat=cfg.remat_tower,
            block_impl=cfg.dense_block_impl,
        )
        if feat_dim != cfg.image_dim:
            raise ValueError(
                f"encoder {cfg.encoder_name!r} emits {feat_dim}-d features but "
                f"config.image_dim={cfg.image_dim}"
            )
        self.image_encoder = encoder
        self.image_projection = ProjectionHead(
            cfg.projection_dim, cfg.dropout, dtype=dtype, name="image_projection"
        )
        self.spot_projection = ProjectionHead(
            cfg.projection_dim, cfg.dropout, dtype=dtype, name="spot_projection"
        )
        if cfg.variant == "attention":
            self.spot_encoder = SpotEncoder(
                spot_dim=cfg.spot_dim,
                heads_num=cfg.heads_num,
                heads_dim=cfg.heads_dim,
                head_layers=cfg.head_layers,
                dropout=cfg.dropout,
                pos_vocab=cfg.pos_vocab,
                dtype=dtype,
                backend=cfg.attn_backend,
                name="spot_encoder",
            )
        elif cfg.variant == "mlp":
            # mclSTExp_MLP: expression + pos tables straight into the head.
            self.pos_tables = PositionTables(cfg.pos_vocab, cfg.spot_dim, name="pos")
        else:
            raise ValueError(f"unknown variant {cfg.variant!r}")

    def encode_image(self, images: jax.Array, train: bool = False) -> jax.Array:
        feats = self.image_encoder(images, train=train)
        return self.image_projection(feats, deterministic=not train).astype(jnp.float32)

    def encode_spots(
        self, expression: jax.Array, positions: jax.Array, train: bool = False
    ) -> jax.Array:
        if self.config.variant == "attention":
            enc = self.spot_encoder(expression, positions, deterministic=not train)
        else:
            enc = expression.astype(jnp.float32) + self.pos_tables(positions)
        return self.spot_projection(enc, deterministic=not train).astype(jnp.float32)

    def __call__(
        self, batch: Dict[str, jax.Array], train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        image_emb = self.encode_image(batch["image"], train=train)
        spot_emb = self.encode_spots(batch["expression"], batch["position"], train=train)
        return image_emb, spot_emb

    def loss(self, batch: Dict[str, jax.Array], train: bool = True) -> jax.Array:
        image_emb, spot_emb = self(batch, train=train)
        return symmetric_infonce(spot_emb, image_emb, self.config.temperature)
