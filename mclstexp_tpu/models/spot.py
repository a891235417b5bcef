"""Spot tower: expression + learnable (x, y) tables -> transformer encoder.

Reference semantics (``model.py:225-240``): spot features are the raw HVG
expression vector plus the x- and y-position embeddings; the *whole
minibatch is one attention sequence* (``unsqueeze(0)``), so the spot encoder
mixes information across the batch. That batch-as-sequence quirk is
load-bearing for parity (SURVEY §5) and is preserved here: callers pass
(B, G) expression and get (B, spot_dim) encodings where the sequence axis
was the batch.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from mclstexp_tpu.core.layers import AttnBlock, PositionTables

Dtype = Any


class SpotEncoder(nn.Module):
    spot_dim: int
    heads_num: int = 8
    heads_dim: int = 64
    head_layers: int = 2
    dropout: float = 0.0
    pos_vocab: int = 65536
    dtype: Dtype = jnp.float32
    backend: str = "xla"  # attention backend: "xla" | "flash" | "ring" (SP
    # over a "seq" mesh axis for mega-slide sequences; core/layers)

    @nn.compact
    def __call__(
        self,
        expression: jax.Array,  # (B, G) or (S, B, G) pre-batched sequences
        positions: jax.Array,  # (..., 2) raw integer coords
        deterministic: bool = True,
    ) -> jax.Array:
        pos_embed = PositionTables(self.pos_vocab, self.spot_dim, name="pos")(positions)
        feats = expression.astype(jnp.float32) + pos_embed

        squeeze = False
        if feats.ndim == 2:
            # batch-as-sequence: (B, G) -> (1, B, G), reference model.py:236
            feats = feats[None]
            squeeze = True

        x = feats.astype(self.dtype)
        for i in range(self.head_layers):
            x = AttnBlock(
                self.spot_dim,
                self.heads_num,
                self.heads_dim,
                mlp_dim=self.spot_dim,
                dropout=self.dropout,
                dtype=self.dtype,
                backend=self.backend,
                name=f"block{i}",
            )(x, deterministic)
        return x[0] if squeeze else x
