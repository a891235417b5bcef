"""Goldens for the symmetric InfoNCE loss, including a torch cross-check.

The reference loss (model.py:242-247) is soft-target CE against the identity
over unnormalized projections; torch (CPU) is available in this image, so we
verify bit-level semantics against ``F.cross_entropy`` directly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mclstexp_tpu.core import losses


def np_log_softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=axis, keepdims=True))


def test_soft_ce_matches_numpy(rng):
    logits = rng.normal(size=(5, 5)).astype(np.float32)
    targets = np.eye(5, dtype=np.float32)
    out = losses.soft_target_cross_entropy(jnp.asarray(logits), jnp.asarray(targets))
    expected = -(targets * np_log_softmax(logits)).sum(-1).mean()
    np.testing.assert_allclose(float(out), expected, rtol=1e-6)


def test_symmetric_infonce_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    b, d = 16, 8
    spot = rng.normal(size=(b, d)).astype(np.float32)
    img = rng.normal(size=(b, d)).astype(np.float32)
    temperature = 0.7

    ours = float(
        losses.symmetric_infonce(jnp.asarray(spot), jnp.asarray(img), temperature)
    )

    ts, ti = torch.tensor(spot), torch.tensor(img)
    cos_smi = (ts @ ti.T) / temperature
    label = torch.eye(b)
    ref = (F.cross_entropy(cos_smi, label) + F.cross_entropy(cos_smi.T, label.T)) / 2
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_infonce_identity_minimum(rng):
    """A diagonal-dominant logit structure should give a lower loss than a
    shuffled one (sanity on the objective's direction)."""
    b, d = 12, 6
    emb = rng.normal(size=(b, d)).astype(np.float32) * 3
    aligned = float(losses.symmetric_infonce(jnp.asarray(emb), jnp.asarray(emb), 1.0))
    perm = rng.permutation(b)
    shuffled = float(
        losses.symmetric_infonce(jnp.asarray(emb), jnp.asarray(emb[perm]), 1.0)
    )
    assert aligned < shuffled


def test_gathered_loss_matches_single_device(rng):
    """Global-batch loss from shard_map over 8 devices == single-device loss."""
    from jax.sharding import Mesh, PartitionSpec as P

    b, d = 32, 16
    spot = rng.normal(size=(b, d)).astype(np.float32)
    img = rng.normal(size=(b, d)).astype(np.float32)
    expected = float(losses.symmetric_infonce(jnp.asarray(spot), jnp.asarray(img), 1.0))

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    fn = jax.shard_map(
        lambda s, i: losses.symmetric_infonce_gathered(s, i, 1.0, "data"),
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=P(),
        check_vma=False,
    )
    out = float(fn(jnp.asarray(spot), jnp.asarray(img)))
    np.testing.assert_allclose(out, expected, rtol=1e-5)
