"""Contrastive losses (pure functions, fp32).

The reference's objective (reference ``model.py:242-247``): with spot and
image embeddings of one batch, logits = spot @ image.T / T; the loss is
soft-target cross-entropy against the identity matrix, averaged over both
directions. Note these are *unnormalized* embeddings — the reference calls
the logit matrix ``cos_smi`` but never L2-normalizes, and we reproduce that.

For multi-device data parallelism the logit matrix must span the *global*
batch (SURVEY §5: per-device CE silently changes the objective). Under
``jax.jit`` with a sharded batch XLA inserts the all-gather automatically
because the B x B matrix consumes every row; `symmetric_infonce_psum`
provides the explicit `shard_map` form for use inside manual SPMD regions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def soft_target_cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean over rows of -sum_j targets_ij * log_softmax(logits)_ij.

    Matches torch ``F.cross_entropy(logits, soft_targets)`` semantics used at
    reference ``model.py:244-245`` (identity soft targets).
    """
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(targets * logp, axis=-1))


def symmetric_infonce(
    spot_emb: jax.Array, image_emb: jax.Array, temperature: float = 1.0
) -> jax.Array:
    """Symmetric InfoNCE with identity targets over a (global) batch.

    spot_emb, image_emb: (B, D) projections of the two towers.
    """
    spot_emb = spot_emb.astype(jnp.float32)
    image_emb = image_emb.astype(jnp.float32)
    logits = (spot_emb @ image_emb.T) / temperature
    eye = jnp.eye(logits.shape[0], logits.shape[1], dtype=jnp.float32)
    spots_loss = soft_target_cross_entropy(logits, eye)
    images_loss = soft_target_cross_entropy(logits.T, eye.T)
    return (spots_loss + images_loss) / 2.0


def symmetric_infonce_gathered(
    spot_emb: jax.Array,
    image_emb: jax.Array,
    temperature: float,
    axis_name: str,
) -> jax.Array:
    """Global-batch InfoNCE from inside a `shard_map` region.

    Each device holds a (B_local, D) shard; embeddings are all-gathered over
    ``axis_name`` (a cheap B x 256 transfer over ICI) so the full B x B logit
    matrix — and therefore the softmax normalizers — see the global batch.
    Returns the same scalar on every device.
    """
    spot_all = jax.lax.all_gather(spot_emb, axis_name, axis=0, tiled=True)
    image_all = jax.lax.all_gather(image_emb, axis_name, axis=0, tiled=True)
    return symmetric_infonce(spot_all, image_all, temperature)
