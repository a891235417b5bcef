"""Ring attention over 8 virtual devices vs dense attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from mclstexp_tpu.parallel.ring_attention import (
    dense_reference_attention,
    ring_self_attention,
)


def test_ring_attention_matches_dense(rng):
    n, h, d = 64, 4, 16  # 8 spots per device
    q = rng.normal(size=(n, h, d)).astype(np.float32)
    k = rng.normal(size=(n, h, d)).astype(np.float32)
    v = rng.normal(size=(n, h, d)).astype(np.float32)

    expected = np.asarray(dense_reference_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))

    mesh = Mesh(np.array(jax.devices()[:8]), ("seq",))
    fn = jax.shard_map(
        lambda q, k, v: ring_self_attention(q, k, v, "seq"),
        mesh=mesh,
        in_specs=(P("seq"), P("seq"), P("seq")),
        out_specs=P("seq"),
        check_vma=False,
    )
    got = np.asarray(fn(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(got, expected, atol=2e-5)


def test_ring_attention_single_device(rng):
    """Degenerates to dense attention on a 1-device ring."""
    n, h, d = 16, 2, 8
    q = rng.normal(size=(n, h, d)).astype(np.float32)
    k = rng.normal(size=(n, h, d)).astype(np.float32)
    v = rng.normal(size=(n, h, d)).astype(np.float32)
    mesh = Mesh(np.array(jax.devices()[:1]), ("seq",))
    fn = jax.shard_map(
        lambda q, k, v: ring_self_attention(q, k, v, "seq"),
        mesh=mesh,
        in_specs=(P("seq"), P("seq"), P("seq")),
        out_specs=P("seq"),
        check_vma=False,
    )
    got = np.asarray(fn(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    expected = np.asarray(dense_reference_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(got, expected, atol=2e-5)
