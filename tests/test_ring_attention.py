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


def test_ring_backend_through_model(rng):
    """backend='ring' is reachable from the flagship model
    (ModelConfig.attn_backend) and matches the dense XLA backend through the
    full spot tower on an 8-device 'seq' mesh — the mega-slide SP path."""
    import dataclasses

    from mclstexp_tpu.config import ModelConfig
    from mclstexp_tpu.models.mclstexp import MclSTExp

    cfg = ModelConfig(
        encoder_name="tiny_cnn", image_dim=128, spot_dim=16, projection_dim=8,
        heads_num=2, heads_dim=4, head_layers=2, pos_vocab=64,
    )
    model_xla = MclSTExp(cfg)
    model_ring = MclSTExp(dataclasses.replace(cfg, attn_backend="ring"))

    n = 16  # 2 spots per device on the 8-ring
    batch = {
        "image": jnp.zeros((n, 16, 16, 3), jnp.float32),
        "expression": jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32)),
        "position": jnp.asarray(rng.integers(0, 64, size=(n, 2)).astype(np.int32)),
    }
    variables = model_xla.init(jax.random.PRNGKey(0), batch)

    expected = model_xla.apply(
        variables, batch["expression"], batch["position"],
        method=MclSTExp.encode_spots,
    )
    mesh = Mesh(np.array(jax.devices()[:8]), ("seq",))
    with mesh:
        got = model_ring.apply(
            variables, batch["expression"], batch["position"],
            method=MclSTExp.encode_spots,
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


def test_ring_backend_requires_mesh(rng):
    """Clear error when backend='ring' runs without an active 'seq' mesh."""
    import dataclasses

    from mclstexp_tpu.config import ModelConfig
    from mclstexp_tpu.models.mclstexp import MclSTExp

    cfg = ModelConfig(
        encoder_name="tiny_cnn", image_dim=128, spot_dim=16, projection_dim=8,
        heads_num=2, heads_dim=4, head_layers=1, pos_vocab=64,
        attn_backend="ring",
    )
    model = MclSTExp(cfg)
    batch = {
        "image": jnp.zeros((8, 16, 16, 3), jnp.float32),
        "expression": jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32)),
        "position": jnp.asarray(rng.integers(0, 64, size=(8, 2)).astype(np.int32)),
    }
    with pytest.raises(ValueError, match="seq"):
        model.init(jax.random.PRNGKey(0), batch)
