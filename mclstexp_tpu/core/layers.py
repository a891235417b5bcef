"""Core transformer layers (flax.linen), written TPU-first.

Functional equivalents of the reference's spot-encoder building blocks
(reference ``model.py:10-69``: pre-LN softmax MHA + GELU MLP with residuals)
and the shared ``ProjectionHead`` (``model.py:151-168``).

Design notes (not a translation):
  * Attention is one fused einsum chain XLA maps onto the MXU; softmax is
    computed in fp32 regardless of the activation dtype.
  * Initializers reproduce torch ``nn.Linear``/``nn.Embedding`` defaults so
    that from-scratch training dynamics match the reference protocol
    (kaiming-uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)); embeddings N(0,1)).
  * GELU is exact (erf), matching torch ``nn.GELU`` default; LayerNorm eps
    is 1e-5, matching torch.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# torch nn.Linear default: kaiming_uniform_(a=sqrt(5)) on the kernel, i.e.
# U(-1/sqrt(fan_in), 1/sqrt(fan_in)); variance_scaling with scale 1/3 gives
# bound sqrt(3 * (1/3) / fan_in) = 1/sqrt(fan_in).
torch_kernel_init = jax.nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)
# torch nn.Embedding default: N(0, 1).
torch_embed_init = jax.nn.initializers.normal(stddev=1.0)


def _torch_bias_init(fan_in: int):
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class DenseT(nn.Module):
    """Dense layer with torch-default initialization and a compute dtype.

    Params are stored fp32; the matmul runs in ``dtype`` (bf16 on TPU keeps
    it on the MXU fast path).
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", torch_kernel_init, (in_features, self.features), jnp.float32
        )
        y = jnp.dot(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            preferred_element_type=self.dtype,
        )
        if self.use_bias:
            bias = self.param(
                "bias", _torch_bias_init(in_features), (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        return y


def gelu_exact(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


def _flash_supported(seq_len: int, dim_head: int) -> bool:
    """The official kernel needs a TPU backend and block-aligned shapes."""
    try:
        import jax.extend.backend as jeb

        on_tpu = jeb.get_backend().platform == "tpu"
    except Exception:
        on_tpu = False
    return on_tpu and seq_len % 128 == 0 and dim_head >= 64


def _ring_shard_map(q: jax.Array, k: jax.Array, v: jax.Array, axis: str) -> jax.Array:
    """Sequence-parallel attention: shard the (b, n, h, d) sequence axis over
    the ambient mesh's `axis` and run parallel.ring_attention under shard_map.

    The mesh comes from the active ``with mesh:`` context (the same context
    the jitted train/eval step runs under), so model code stays
    placement-free. Weights/other axes replicate; only the sequence moves.
    """
    from jax._src.mesh import thread_resources
    from jax.sharding import PartitionSpec as P

    from mclstexp_tpu.parallel.ring_attention import ring_self_attention

    mesh = thread_resources.env.physical_mesh
    if mesh.empty or axis not in mesh.axis_names:
        raise ValueError(
            f"backend='ring' needs an active mesh with a {axis!r} axis; "
            f"got mesh axes {getattr(mesh, 'axis_names', ())}"
        )
    n = q.shape[1]
    n_dev = mesh.shape[axis]
    if n % n_dev != 0:
        raise ValueError(f"sequence length {n} must divide the {axis!r} axis ({n_dev})")

    def local(qb, kb, vb):  # (b, n_local, h, d) blocks
        return jax.vmap(
            lambda q_, k_, v_: ring_self_attention(q_, k_, v_, axis)
        )(qb, kb, vb)

    spec = P(None, axis, None, None)
    return jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)


class LayerNormT(nn.Module):
    """LayerNorm with torch semantics (eps=1e-5, fp32 statistics)."""

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype)


class MultiHeadSelfAttention(nn.Module):
    """Softmax MHA over a (batch, seq, dim) activation.

    Matches reference ``model.py:35-57``: fused qkv projection without bias,
    per-head scale ``dim_head**-0.5``, output projection (present whenever
    heads != 1 or dim_head != dim).

    backend="flash" uses the official Pallas TPU flash-attention kernel
    (online softmax, no materialized (n, n) matrix) when running on TPU
    with a block-aligned sequence — the memory-bound win for whole-slide
    spot sequences; everything else falls back to the fused-XLA path,
    which is optimal at the contrastive model's tiny sequence lengths.

    backend="ring" is the sequence-parallel (SP) path for mega-slides whose
    spot sequence exceeds one chip's HBM: the sequence axis is sharded over
    the ambient mesh's `ring_axis` and K/V blocks rotate via ppermute
    (parallel/ring_attention). Requires an active `with mesh:` whose
    `ring_axis` divides the sequence length; masks are unsupported (shard
    the un-padded sequence instead).
    """

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    backend: str = "xla"  # "xla" | "flash" | "ring"
    qkv_bias: bool = False  # reference spot attention: no bias (model.py:43);
    # timm ViT towers: qkv_bias=True
    ring_axis: str = "seq"  # mesh axis the sequence shards over (ring only)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        deterministic: bool = True,
        mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        b, n, _ = x.shape
        h, d = self.heads, self.dim_head
        inner = h * d
        project_out = not (h == 1 and d == self.dim)

        qkv = DenseT(inner * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="to_qkv")(x)
        qkv = qkv.reshape(b, n, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, n, h, d)

        scale = d**-0.5
        if self.backend == "ring":
            if mask is not None:
                raise NotImplementedError(
                    "backend='ring' does not support masks; shard the "
                    "un-padded sequence instead"
                )
            out = _ring_shard_map(q, k, v, self.ring_axis)
        elif self.backend == "flash" and _flash_supported(n, d):
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                SegmentIds,
                flash_attention,
            )

            seg = None
            if mask is not None:
                # padded tokens get a different segment id: no attention
                # crosses the real/pad boundary in either direction
                m = jnp.broadcast_to(mask, (b, n)).astype(jnp.int32)
                seg = SegmentIds(q=m, kv=m)
            out = flash_attention(
                q.transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                segment_ids=seg,
                sm_scale=scale,
            ).transpose(0, 2, 1, 3)
        else:
            # (b, h, n, n) logits in fp32 for a stable softmax.
            logits = jnp.einsum(
                "bihd,bjhd->bhij", q, k, preferred_element_type=jnp.float32
            ) * scale
            if mask is not None:
                # mask: (b, n) or (n,) key-validity — padded tokens get no weight
                key_mask = jnp.broadcast_to(mask, (b, n))[:, None, None, :]
                logits = jnp.where(key_mask, logits, -1e30)
            attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum(
                "bhij,bjhd->bihd", attn, v, preferred_element_type=self.dtype
            )
        out = out.reshape(b, n, inner)
        if project_out:
            out = DenseT(self.dim, dtype=self.dtype, name="to_out")(out)
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class FeedForward(nn.Module):
    """GELU MLP (reference ``model.py:20-32``)."""

    dim: int
    hidden_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = DenseT(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = gelu_exact(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = DenseT(self.dim, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class AttnBlock(nn.Module):
    """Pre-LN transformer block: x + MHA(LN(x)); x + FF(LN(x)).

    (reference ``model.py:60-69``; mlp hidden dim == model dim there.)
    """

    dim: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    backend: str = "xla"
    qkv_bias: bool = False
    ln_eps: float = 1e-5  # torch default; timm ViT blocks use 1e-6

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        deterministic: bool = True,
        mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        h = LayerNormT(epsilon=self.ln_eps, dtype=self.dtype, name="norm_attn")(x)
        h = MultiHeadSelfAttention(
            self.dim, self.heads, self.dim_head, self.dropout, self.dtype,
            self.backend, self.qkv_bias, name="attn",
        )(h, deterministic, mask)
        x = x + h
        h = LayerNormT(epsilon=self.ln_eps, dtype=self.dtype, name="norm_ff")(x)
        h = FeedForward(self.dim, self.mlp_dim, self.dropout, self.dtype, name="ff")(
            h, deterministic
        )
        return x + h


class ProjectionHead(nn.Module):
    """Linear -> GELU -> Linear -> Dropout, residual to the first projection,
    then LayerNorm (reference ``model.py:151-168``). Shared by both towers.
    """

    projection_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        projected = DenseT(self.projection_dim, dtype=self.dtype, name="projection")(x)
        h = gelu_exact(projected)
        h = DenseT(self.projection_dim, dtype=self.dtype, name="fc")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = h + projected
        return LayerNormT(dtype=self.dtype, name="layer_norm")(h)


class PositionTables(nn.Module):
    """Learnable (x, y) positional tables indexed by raw integer coords
    (reference ``model.py:204-205,230-234``: two ``nn.Embedding(65536, dim)``
    tables, N(0,1) init, summed into the spot features).
    """

    vocab: int
    dim: int

    @nn.compact
    def __call__(self, positions: jax.Array) -> jax.Array:
        # positions: (..., 2) float or int raw coordinates.
        pos = positions.astype(jnp.int32)
        x_tab = self.param("x_embed", torch_embed_init, (self.vocab, self.dim), jnp.float32)
        y_tab = self.param("y_embed", torch_embed_init, (self.vocab, self.dim), jnp.float32)
        # NOTE: the plain row gather is the fast form. The 2x206 MB tables
        # cost ~9.6 ms/step of the B=128 bench step (dense torch-Adam decay
        # semantics + XLA layout copies, xprof in PROFILE_r02.md); a flat
        # 1-D-gather reformulation was measured WORSE (82.1 vs 75.5 ms/step:
        # the gather lowers to a 6.3 ms custom fusion and the copies stay).
        cx = jnp.take(x_tab, pos[..., 0], axis=0)
        cy = jnp.take(y_tab, pos[..., 1], axis=0)
        return cx + cy
