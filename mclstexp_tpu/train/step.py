"""The jitted train step: augment -> towers -> InfoNCE -> Adam, one program.

Everything the reference does per step across Python, the DataLoader, and
CUDA kernels (reference ``train.py:30-42``: host-side augmentation, `.cuda()`
transfer, forward, backward, step) compiles here into a single XLA program
over the mesh: uint8 patches arrive sharded on the data axis, augmentation
runs on-device (ops.augment), both towers and the global-batch loss fuse
into one backward pass, and the Adam update donates the state buffers.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from mclstexp_tpu.core.losses import symmetric_infonce
from mclstexp_tpu.models.mclstexp import MclSTExp
from mclstexp_tpu.ops import augment
from mclstexp_tpu.train.state import TrainState


def make_train_step(
    model: MclSTExp,
    augment_mode: str = "st",  # "st" (jitter+flip+rotate) | "tenx" | "none"
    donate: bool = True,
    rot_impl: str = "paeth",  # "paeth" (Pallas 3-shear, ~5x faster) | "gather"
    tenx_raw_scale: bool = False,
) -> Callable:
    """Build the jitted step: (state, batch, rng) -> (state, loss).

    batch: {"image_u8": (B, P, P, 3) uint8, "expression": (B, G) f32,
    "position": (B, 2) i32}. Augmentation is part of the compiled program;
    rot_impl="paeth" uses the shear-decomposed rotation (statistically
    equivalent resampling, see ops/augment.rotate_batch_paeth) — pass
    "gather" for torchvision-exact nearest-neighbor sampling.
    tenx_raw_scale feeds Visium patches as raw 0-255 floats (reference
    dataset.py:336 quirk; DataConfig.visium_raw_scale).
    """

    aug_dtype = jnp.bfloat16 if model.config.dtype == "bfloat16" else jnp.float32

    def step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        aug_rng, dropout_rng = jax.random.split(rng)
        if augment_mode == "st":
            images = augment.train_augment_inline(
                aug_rng, batch["image_u8"], dtype=aug_dtype, rot_impl=rot_impl
            )
        elif augment_mode == "tenx":
            images = augment.tenx_augment_inline(
                aug_rng, batch["image_u8"], raw_scale=tenx_raw_scale
            )
        else:
            images = batch["image_u8"].astype(jnp.float32) / 255.0

        model_batch = {
            "image": images,
            "expression": batch["expression"],
            "position": batch["position"],
        }

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (image_emb, spot_emb), updates = model.apply(
                variables,
                model_batch,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            loss = symmetric_infonce(spot_emb, image_emb, model.config.temperature)
            return loss, updates.get("batch_stats", state.batch_stats)

        (loss, new_batch_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads, new_batch_stats)
        return new_state, loss

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_eval_embed_step(
    model: MclSTExp, eval_augment: bool = False, raw_scale: bool = False
) -> Callable:
    """Jitted embedding step for the dump phase (reference
    ``evel_her2st.py:44-70``): float images, batch-as-sequence spot tower,
    both projections. Returns (image_emb, spot_emb).

    eval_augment=True applies the TenxDataset random flips/rotations at
    inference — the Visium parity quirk (reference ``dataset.py:316-325``
    always transforms, and ``evel_visium.py:19-31`` consumes it as-is).
    raw_scale=True keeps the raw 0-255 float scale (dataset.py:336 quirk).
    """

    def embed(params, batch_stats, batch: Dict[str, jax.Array], rng=None):
        variables = {"params": params, "batch_stats": batch_stats}
        if eval_augment:
            images = augment.tenx_augment_inline(
                rng, batch["image_u8"], raw_scale=raw_scale
            )
        elif raw_scale:
            images = batch["image_u8"].astype(jnp.float32)
        else:
            images = batch["image_u8"].astype(jnp.float32) / 255.0
        model_batch = {
            "image": images,
            "expression": batch["expression"],
            "position": batch["position"],
        }
        return model.apply(variables, model_batch, train=False)

    return jax.jit(embed)
