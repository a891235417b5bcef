"""Train state and optimizer.

Optimizer parity: the reference uses ``torch.optim.Adam(lr=1e-4,
weight_decay=1e-3)`` (reference ``train.py:118-120``) — *coupled* L2 (the
decay term is added to the gradient before the Adam moments), not AdamW.
The optax chain below reproduces exactly that ordering.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mclstexp_tpu.config import ModelConfig, TrainConfig
from mclstexp_tpu.models.mclstexp import MclSTExp


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any  # BatchNorm running statistics (image towers)
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
        )


def torch_adam(lr, weight_decay: float) -> optax.GradientTransformation:
    """torch.optim.Adam with coupled weight_decay (L2-to-gradient).

    `lr` may be a float or an optax schedule (step -> lr); the latter
    reproduces torch's epoch-interval LR schedulers when the schedule is
    built from a known steps-per-epoch (e.g. Hist2ST's StepLR,
    reference ``baselines/His2ST/HIST2ST.py:237``)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(lr),
    )


def create_train_state(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    sample_batch: Dict[str, jax.Array],
    rng: Optional[jax.Array] = None,
    init_on_host: bool = True,
) -> tuple[MclSTExp, TrainState]:
    """Initialize the flagship model and its optimizer state.

    On an accelerator backend, initialization runs as ONE jitted on-device
    program: flax's *unjitted* init dispatches thousands of small ops —
    pathological over a remote-TPU transport — and host-init-then-transfer
    ships ~1.2 GB of params+opt state per fold (~107 s measured over the
    tunnel vs ~25 s compile once, ~0 s per subsequent fold from the
    persistent compilation cache; JAX's threefry PRNG makes the values
    platform-independent). Shrink `sample_batch` to one example — param
    shapes don't depend on batch size. `init_on_host=True` (compat) now
    means "don't run unjitted init on the accelerator"; the jitted path is
    used either way on non-CPU backends.
    """
    model = MclSTExp(model_cfg)
    rng = rng if rng is not None else jax.random.PRNGKey(train_cfg.seed)
    tx = torch_adam(train_cfg.lr, train_cfg.weight_decay)

    def _init(k, b):
        return model.init({"params": k, "dropout": k}, b, train=False)

    default_platform = jax.local_devices()[0].platform
    if default_platform != "cpu":
        variables = jax.jit(_init)(rng, sample_batch)
        opt_init = jax.jit(tx.init)
    else:
        variables = _init(rng, sample_batch)
        opt_init = tx.init

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if model_cfg.pretrained_path:
        # Reference default: training starts from an ImageNet-pretrained
        # image tower (model.py:73,89,104-108); graft the imported tower
        # into the fresh init before the optimizer state is built.
        from mclstexp_tpu.models.image.torch_import import load_pretrained_tower

        params, batch_stats = load_pretrained_tower(
            dict(params), dict(batch_stats), model_cfg.pretrained_path,
            model_cfg.encoder_name,
        )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_init(params),
        tx=tx,
    )
    return model, state
