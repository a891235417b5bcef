"""Tensor-parallel (GSPMD rules) coverage on the 8-virtual-device mesh.

parallel/tp.py generalizes the DDP semantics of the reference's only
distributed code (reference ``baselines/Bleep/BLEEP_main.py:76-78,147``) to
a 2-D (data, model) mesh. These tests pin two things: (1) the rules place
the qkv/fc kernels and positional tables with real model-axis shardings,
and (2) one full train step over the (4, 2) mesh produces the same loss and
parameter update as the replicated single-device run.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mclstexp_tpu.config import ModelConfig, TrainConfig
from mclstexp_tpu.parallel.mesh import make_mesh
from mclstexp_tpu.parallel.tp import shard_params, tp_param_specs
from mclstexp_tpu.train.state import create_train_state
from mclstexp_tpu.train.step import make_train_step

TINY = ModelConfig(
    encoder_name="tiny_cnn", image_dim=128, spot_dim=16, projection_dim=8,
    heads_num=2, heads_dim=4, head_layers=1, pos_vocab=64,
)


def _batch(rng, n=8):
    return {
        "image_u8": rng.integers(0, 256, size=(n, 16, 16, 3)).astype(np.uint8),
        "expression": rng.normal(size=(n, 16)).astype(np.float32),
        "position": rng.integers(0, 64, size=(n, 2)).astype(np.int32),
    }


def _sample(batch):
    return {
        "image": batch["image_u8"][:1].astype(np.float32) / 255.0,
        "expression": batch["expression"][:1],
        "position": batch["position"][:1],
    }


def test_tp_rules_assign_model_axis_specs():
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    _, state = create_train_state(TINY, TrainConfig(batch_size=8), _sample(batch))
    specs = tp_param_specs(state.params)
    blk = specs["spot_encoder"]["block0"]
    assert blk["attn"]["to_qkv"]["kernel"] == P(None, "model")
    assert blk["attn"]["to_out"]["kernel"] == P("model", None)
    assert blk["ff"]["fc1"]["kernel"] == P(None, "model")
    assert blk["ff"]["fc2"]["kernel"] == P("model", None)
    assert specs["spot_encoder"]["pos"]["x_embed"] == P(None, "model")
    assert specs["image_projection"]["projection"]["kernel"] == P(None, "model")
    assert specs["image_projection"]["fc"]["kernel"] == P("model", None)
    # non-TP leaves replicate
    assert specs["image_encoder"]["conv0"]["kernel"] == P()


def test_tp_sharded_step_matches_replicated():
    rng = np.random.default_rng(1)
    batch = _batch(rng, n=8)
    model, state = create_train_state(TINY, TrainConfig(batch_size=8), _sample(batch))
    step_rng = jax.random.PRNGKey(7)
    step_fn = make_train_step(model, augment_mode="none", donate=False)

    # Replicated single-device reference run.
    ref_state, ref_loss = step_fn(state, jax.device_get(batch), step_rng)

    # Sharded run over the (4, 2) data x model mesh.
    mesh = make_mesh((4, 2), ("data", "model"))
    sharded_params = shard_params(state.params, mesh)
    # kernels the rules target must actually land model-sharded
    qkv = sharded_params["spot_encoder"]["block0"]["attn"]["to_qkv"]["kernel"]
    assert qkv.sharding.spec == P(None, "model"), qkv.sharding
    xemb = sharded_params["spot_encoder"]["pos"]["x_embed"]
    assert xemb.sharding.spec == P(None, "model"), xemb.sharding

    repl = NamedSharding(mesh, P())
    sh_state = state.replace(
        params=sharded_params,
        batch_stats=jax.tree.map(lambda x: jax.device_put(x, repl), state.batch_stats),
        opt_state=jax.tree.map(
            lambda x: jax.device_put(x, repl) if hasattr(x, "shape") else x,
            state.opt_state,
        ),
    )
    data_sh = NamedSharding(mesh, P("data"))
    device_batch = {k: jax.device_put(v, data_sh) for k, v in batch.items()}
    with mesh:
        new_state, loss = step_fn(sh_state, device_batch, step_rng)
        loss.block_until_ready()

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    # the Adam update itself must agree leaf-wise with the replicated run
    for path in (
        ("spot_encoder", "block0", "attn", "to_qkv", "kernel"),
        ("image_projection", "projection", "kernel"),
        ("image_encoder", "conv0", "kernel"),
    ):
        a = ref_state.params
        b = new_state.params
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(jax.device_get(b)), rtol=2e-5, atol=2e-6,
            err_msg="/".join(path),
        )


def test_tp_sharded_step_matches_replicated_piecewise_dense():
    """The shipping bundled-piecewise dense-block materialization composes
    with the (data, model) mesh exactly like concat — same loss, same Adam
    update. "piecewise2" so the bundle MERGE (the trailing-pieces concat)
    actually fires at tiny_densenet's 2-layer block depth — the shipping
    piecewise8 only merges at >=8-layer blocks.

    The full-scale multichip dryrun pins its train step to concat because
    piecewise's ~9x more HLO segments compile 3.1x slower under the CPU
    GSPMD emulation (__graft_entry__.py); this test carries the
    piecewise+sharding evidence at a scale the suite can afford.
    """
    cfg = ModelConfig(
        encoder_name="tiny_densenet", image_dim=16, spot_dim=16,
        projection_dim=8, heads_num=2, heads_dim=4, head_layers=1,
        pos_vocab=64, dense_block_impl="piecewise2",
    )
    rng = np.random.default_rng(3)
    batch = _batch(rng, n=8)
    model, state = create_train_state(cfg, TrainConfig(batch_size=8), _sample(batch))
    step_rng = jax.random.PRNGKey(11)
    step_fn = make_train_step(model, augment_mode="none", donate=False)
    ref_state, ref_loss = step_fn(state, jax.device_get(batch), step_rng)

    mesh = make_mesh((4, 2), ("data", "model"))
    repl = NamedSharding(mesh, P())
    sh_state = state.replace(
        params=shard_params(state.params, mesh),
        batch_stats=jax.tree.map(lambda x: jax.device_put(x, repl), state.batch_stats),
        opt_state=jax.tree.map(
            lambda x: jax.device_put(x, repl) if hasattr(x, "shape") else x,
            state.opt_state,
        ),
    )
    data_sh = NamedSharding(mesh, P("data"))
    device_batch = {k: jax.device_put(v, data_sh) for k, v in batch.items()}
    with mesh:
        new_state, loss = step_fn(sh_state, device_batch, step_rng)
        loss.block_until_ready()
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    for path in (
        ("image_encoder", "denseblock1", "denselayer1", "conv1", "kernel"),
        ("image_encoder", "conv0", "kernel"),
        ("spot_encoder", "block0", "attn", "to_qkv", "kernel"),
    ):
        a, b = ref_state.params, new_state.params
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(jax.device_get(b)), rtol=2e-5, atol=2e-6,
            err_msg="/".join(path),
        )
    # train-mode sliced-BN running stats update under sharding too
    bs_ref = ref_state.batch_stats["image_encoder"]["denseblock1"]["denselayer2"]["norm1"]["mean"]
    bs_new = new_state.batch_stats["image_encoder"]["denseblock1"]["denselayer2"]["norm1"]["mean"]
    np.testing.assert_allclose(
        np.asarray(bs_ref), np.asarray(jax.device_get(bs_new)), rtol=2e-5, atol=2e-6
    )


def test_tp_uneven_dims_fall_back_to_replication():
    """Leaves whose sharded dim doesn't divide the model axis replicate
    (tp.py even-divisibility fallback)."""
    cfg = ModelConfig(
        encoder_name="tiny_cnn", image_dim=128, spot_dim=15,  # odd: 15 % 2 != 0
        projection_dim=8, heads_num=1, heads_dim=3, head_layers=1, pos_vocab=64,
    )
    rng = np.random.default_rng(2)
    batch = {
        "image": rng.uniform(size=(1, 16, 16, 3)).astype(np.float32),
        "expression": rng.normal(size=(1, 15)).astype(np.float32),
        "position": rng.integers(0, 64, size=(1, 2)).astype(np.int32),
    }
    _, state = create_train_state(cfg, TrainConfig(batch_size=4), batch)
    mesh = make_mesh((4, 2), ("data", "model"))
    sharded = shard_params(state.params, mesh)
    # x_embed is (64, 15): 15 % 2 != 0 -> replicated despite the rule
    xemb = sharded["spot_encoder"]["pos"]["x_embed"]
    assert xemb.sharding.spec == P(), xemb.sharding
    # qkv kernel is (15, 9): 9 % 2 != 0 -> replicated
    qkv = sharded["spot_encoder"]["block0"]["attn"]["to_qkv"]["kernel"]
    assert qkv.sharding.spec == P(), qkv.sharding
