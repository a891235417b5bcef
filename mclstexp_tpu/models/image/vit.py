"""ViT-B/32 image tower in flax (NHWC).

Encoder selectable as ``encoder_name="vit"`` (reference ``model.py:104-116``:
timm ``vit_base_patch32_224`` with ``num_classes=0, global_pool="avg"``).
224/32 = 7x7 = 49 patch tokens; dim 768, 12 layers, 12 heads, qkv bias,
LayerNorm eps 1e-6.

timm semantics for ``global_pool="avg"`` (timm >= 0.6, required for the
``global_pool`` kwarg the reference passes): ``use_fc_norm`` is enabled, so
the blocks' output is mean-pooled over the patch tokens (cls excluded)
FIRST and the final LayerNorm (``fc_norm``) is applied to the pooled
vector — pool-then-norm, not norm-then-pool. The importer accepts either
``norm.*`` or ``fc_norm.*`` checkpoint keys for that final norm.

Reuses the core transformer blocks; the patch embed is one strided conv
that XLA lowers to a single (B*49, 3072) x (3072, 768) MXU matmul.

Scoped exception to the torch-parity-init invariant (CLAUDE.md): the
FROM-SCRATCH initializers here (zeros cls_token, normal(0.02) pos_embed,
lecun patch embed) are not bit-faithful to timm's trunc_normal scheme.
The reference only ever builds this tower with ``pretrained=True``
(``model.py:106-110``), so its scratch init is unreachable in any
reference flow; parity runs graft the pretrained weights via
``--pretrained`` / ``torch_import`` (golden-tested), where init draws
are irrelevant.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from mclstexp_tpu.core.layers import AttnBlock, LayerNormT

Dtype = Any


class ViTEncoder(nn.Module):
    patch_size: int = 32
    dim: int = 768
    depth: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    dtype: Dtype = jnp.float32
    # CLIP-style towers (timm ``*_clip_laion2b``, BLEEP's ImageEncoder_CLIP,
    # reference ``baselines/Bleep/modules.py:97-110``) add a LayerNorm on
    # the embedded tokens before the first block (timm ``norm_pre``).
    pre_norm: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        del train  # no batch norm in ViT
        b = x.shape[0]
        x = x.astype(self.dtype)
        x = nn.Conv(
            self.dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            kernel_init=jax.nn.initializers.lecun_normal(),
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        x = x.reshape(b, -1, self.dim)  # (B, N, D)
        n = x.shape[1]

        cls = self.param(
            "cls_token", jax.nn.initializers.zeros, (1, 1, self.dim), jnp.float32
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)).astype(self.dtype), x], axis=1)
        pos = self.param(
            "pos_embed",
            jax.nn.initializers.normal(stddev=0.02),
            (1, n + 1, self.dim),
            jnp.float32,
        )
        x = x + pos.astype(self.dtype)
        if self.pre_norm:
            x = LayerNormT(epsilon=1e-6, dtype=self.dtype, name="norm_pre")(x)

        for i in range(self.depth):
            x = AttnBlock(
                self.dim,
                self.heads,
                self.dim // self.heads,
                self.mlp_dim,
                dtype=self.dtype,
                qkv_bias=True,
                ln_eps=1e-6,
                name=f"block{i}",
            )(x)
        # global_pool="avg" + use_fc_norm: mean over patch tokens (cls token
        # excluded) first, final LayerNorm (timm's fc_norm) on the pooled
        # vector. See module docstring.
        x = jnp.mean(x[:, 1:], axis=1)
        return LayerNormT(epsilon=1e-6, dtype=self.dtype, name="norm")(x).astype(
            jnp.float32
        )


class TinyCNN(nn.Module):
    """Small conv tower for CPU-runnable tests and the synthetic preset.

    Not a reference component — the engineering substrate SURVEY §4 calls
    for (fast fake tower so the end-to-end slice runs on CPU in seconds).
    """

    features: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        del train
        x = x.astype(self.dtype)
        for i, f in enumerate((16, 32, 64)):
            x = nn.Conv(f, (3, 3), strides=(2, 2), dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=8, dtype=self.dtype, name=f"gn{i}")(x)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.features, dtype=self.dtype, name="head")(x)
        return x.astype(jnp.float32)


def vit_b32(dtype=jnp.float32):
    return ViTEncoder(dtype=dtype)


def vit_l32(dtype=jnp.float32):
    """ViT-L/32 (timm ``vit_large_patch32_224_in21k``): BLEEP's ViT-L
    encoder option (reference ``baselines/Bleep/modules.py:113-126``)."""
    return ViTEncoder(dim=1024, depth=24, heads=16, mlp_dim=4096, dtype=dtype)


def clip_vit_b32(dtype=jnp.float32):
    """CLIP ViT-B/32 (timm ``vit_base_patch32_224_clip_laion2b``): BLEEP's
    CLIP-pretrained encoder option (``modules.py:97-110``). Same trunk as
    ViT-B/32 plus the CLIP pre-norm on the embedded tokens."""
    return ViTEncoder(dtype=dtype, pre_norm=True)
