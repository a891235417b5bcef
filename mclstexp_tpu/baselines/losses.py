"""Baseline losses: NB / ZINB likelihoods and the BLEEP CLIP objective.

  * ``nb_loss`` — negative binomial NLL in the (log-r, logit-p)
    parameterization of Hist2ST's NB head (reference
    ``baselines/His2ST/NB_module.py:18-24``).
  * ``zinb_loss`` — zero-inflated NB NLL on (mean, dispersion, pi) with
    per-spot size factors (``NB_module.py:26-46``).
  * ``bleep_clip_loss`` — CLIP loss with *soft* targets from the softmax of
    the averaged intra-modal similarities (reference
    ``baselines/Bleep/models.py:34-43``), unlike mclSTExp's identity targets.

All fp32 pure functions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mclstexp_tpu.core.losses import soft_target_cross_entropy


def nb_loss(x: jax.Array, log_r: jax.Array, logit_p: jax.Array,
            mask: "jax.Array | None" = None) -> jax.Array:
    """NB NLL; x raw counts (N, G), heads emit log-dispersion r and logit p.

    mask: optional (N,) bool over spots — pad rows contribute NOTHING, so a
    bucket-padded slide's loss equals the unpadded slide's (the reference
    trains unpadded dynamic shapes, NB_module.py:18-24)."""
    x = x.astype(jnp.float32)
    r = jnp.exp(log_r)
    ll = jax.lax.lgamma(r + x) - jax.lax.lgamma(r)
    ll += logit_p * x - jnp.log1p(jnp.exp(logit_p)) * (x + r)
    per_spot = -jnp.sum(ll, axis=-1)
    if mask is None:
        return jnp.mean(per_spot)
    w = mask.astype(jnp.float32)
    return jnp.sum(per_spot * w) / jnp.maximum(jnp.sum(w), 1.0)


def zinb_loss(
    x: jax.Array,
    mean: jax.Array,
    disp: jax.Array,
    pi: jax.Array,
    scale_factor: jax.Array,
    ridge_lambda: float = 0.0,
    eps: float = 1e-10,
    mask: "jax.Array | None" = None,
) -> jax.Array:
    """ZINB NLL; mean/disp positive, pi in (0, 1), scale_factor (N,).

    mask: optional (N,) bool over spots — pad rows (whose zero_case term is
    strictly positive) are excluded from the mean so the padded slide's
    loss and gradients equal the unpadded slide's (reference
    NB_module.py:26-46 sees only real spots)."""
    x = x.astype(jnp.float32)
    mean = mean * scale_factor[:, None]

    t1 = jax.lax.lgamma(disp + eps) + jax.lax.lgamma(x + 1.0) - jax.lax.lgamma(x + disp + eps)
    t2 = (disp + x) * jnp.log1p(mean / (disp + eps)) + x * (
        jnp.log(disp + eps) - jnp.log(mean + eps)
    )
    nb_nll = t1 + t2

    nb_case = nb_nll - jnp.log(1.0 - pi + eps)
    zero_nb = jnp.power(disp / (disp + mean + eps), disp)
    zero_case = -jnp.log(pi + (1.0 - pi) * zero_nb + eps)
    out = jnp.where(x <= 1e-8, zero_case, nb_case)
    if ridge_lambda > 0:
        out = out + ridge_lambda * jnp.square(pi)
    if mask is None:
        return jnp.mean(out)
    w = mask.astype(jnp.float32)[:, None]
    return jnp.sum(out * w) / jnp.maximum(jnp.sum(w) * out.shape[1], 1.0)


def mean_act(x: jax.Array) -> jax.Array:
    """ZINB mean head activation: clamp(exp(x), 1e-5, 1e6)."""
    return jnp.clip(jnp.exp(x), 1e-5, 1e6)


def disp_act(x: jax.Array) -> jax.Array:
    """ZINB dispersion head activation: clamp(softplus(x), 1e-4, 1e4)."""
    return jnp.clip(jax.nn.softplus(x), 1e-4, 1e4)


def bleep_clip_loss(
    spot_emb: jax.Array, image_emb: jax.Array, temperature: float = 1.0
) -> jax.Array:
    spot_emb = spot_emb.astype(jnp.float32)
    image_emb = image_emb.astype(jnp.float32)
    logits = (spot_emb @ image_emb.T) / temperature
    img_sim = image_emb @ image_emb.T
    spot_sim = spot_emb @ spot_emb.T
    targets = jax.nn.softmax(((img_sim + spot_sim) / 2.0) / temperature, axis=-1)
    spots_loss = soft_target_cross_entropy(logits, targets)
    images_loss = soft_target_cross_entropy(logits.T, targets.T)
    return (spots_loss + images_loss) / 2.0


def bleep_clip_loss_gathered(
    spot_emb: jax.Array,
    image_emb: jax.Array,
    temperature: float,
    axis_name: str,
) -> jax.Array:
    """Global-batch BLEEP loss from inside a ``shard_map`` region.

    The reference trains BLEEP under DDP (``Bleep/BLEEP_main.py:57,76-78,
    147``) where each rank computes the CLIP loss over its LOCAL batch and
    only gradients are all-reduced — so DDP *changes* the objective as world
    size grows (smaller logit matrices). The TPU-native form keeps the
    objective fixed instead: all-gather both (B_local, P) embedding sets
    over ``axis_name`` (cheap over ICI) so the soft targets' intra-modal
    similarities and the cross-modal logit matrix all span the GLOBAL batch,
    exactly matching single-device training at any device count. Returns the
    same scalar on every device.
    """
    spot_all = jax.lax.all_gather(spot_emb, axis_name, axis=0, tiled=True)
    image_all = jax.lax.all_gather(image_emb, axis_name, axis=0, tiled=True)
    return bleep_clip_loss(spot_all, image_all, temperature)
