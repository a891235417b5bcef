"""Ring self-attention: sequence-parallel attention over the "data" mesh axis.

The slide-level baselines attend over every spot of a section at once
(N up to ~4,900 at reference scale, ``evel_visium.py:145`` — trivially
in-HBM). This module is the *scaling* path SURVEY §5 sketches for
mega-slides: the spot sequence is sharded across devices, each device holds
its Q/K/V block, and K/V blocks rotate around the ring with
`jax.lax.ppermute` while a numerically-stable online softmax accumulates
partial results — O(N/d) memory per device, ICI-bandwidth-bound, no
materialized (N, N) matrix.

Used via `ring_self_attention` inside `shard_map` (see tests for the
8-virtual-device equivalence check against dense attention).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _online_softmax_step(carry, kv_block, q, scale):
    """Merge one K/V block into the running (out, row_max, row_sum)."""
    out, m, l = carry
    k, v = kv_block
    s = jnp.einsum("qhd,khd->hqk", q, k, preferred_element_type=jnp.float32) * scale
    m_new = jnp.maximum(m, s.max(axis=-1))  # (h, q)
    alpha = jnp.exp(m - m_new)  # rescale old accumulators
    p = jnp.exp(s - m_new[..., None])  # (h, q, k)
    l_new = l * alpha + p.sum(axis=-1)
    out_new = out * alpha[..., None] + jnp.einsum(
        "hqk,khd->hqd", p, v, preferred_element_type=jnp.float32
    )
    return (out_new, m_new, l_new)


def ring_self_attention(
    q: jax.Array,  # (n_local, heads, dim_head) — this device's query block
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    scale: Optional[float] = None,
) -> jax.Array:
    """Full-sequence softmax attention with K/V rotating around the ring.

    Call inside `shard_map` with the sequence sharded over `axis_name`.
    Returns this device's (n_local, heads, dim_head) output block; the
    result equals dense attention over the gathered sequence.
    """
    n_dev = jax.lax.axis_size(axis_name)
    scale = scale if scale is not None else q.shape[-1] ** -0.5
    h, nq = q.shape[1], q.shape[0]
    qt = q.astype(jnp.float32)

    out = jnp.zeros((h, nq, q.shape[2]), jnp.float32)
    m = jnp.full((h, nq), -jnp.inf, jnp.float32)
    l = jnp.zeros((h, nq), jnp.float32)

    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def body(i, state):
        out, m, l, k_blk, v_blk = state
        out, m, l = _online_softmax_step(
            (out, m, l), (k_blk.astype(jnp.float32), v_blk.astype(jnp.float32)),
            qt, scale,
        )
        # rotate K/V to the next device; the last rotation is redundant but
        # keeps the loop shape static (XLA elides unused outputs).
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return (out, m, l, k_blk, v_blk)

    out, m, l, _, _ = jax.lax.fori_loop(0, n_dev, body, (out, m, l, k, v))
    out = out / l[..., None]
    return out.transpose(1, 0, 2).astype(q.dtype)  # (n_local, h, d)


def dense_reference_attention(q, k, v, scale: Optional[float] = None):
    """Plain softmax attention over full (n, h, d) arrays (test oracle)."""
    scale = scale if scale is not None else q.shape[-1] ** -0.5
    s = jnp.einsum("qhd,khd->hqk", q, k, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("hqk,khd->hqd", p, v, preferred_element_type=jnp.float32)
    return out.transpose(1, 0, 2).astype(q.dtype)
