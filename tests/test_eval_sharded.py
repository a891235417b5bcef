"""Multi-chip embedding sweep: sharded B=32-batch distribution must equal
the single-device protocol sweep exactly (the batches are identical
attention sequences, just executed on different devices)."""

import jax
import numpy as np
import pytest

from mclstexp_tpu.config import ModelConfig, TrainConfig
from mclstexp_tpu.data import synthetic
from mclstexp_tpu.infer import embed
from mclstexp_tpu.parallel.mesh import make_mesh
from mclstexp_tpu.train.state import create_train_state


@pytest.fixture(scope="module")
def setup():
    # 3 x 50 = 150 spots, batch 8 -> 18 full batches + a 6-spot remainder;
    # 18 batches over 8 devices pads to 24 (uneven split exercised).
    sections = synthetic.make_dataset(num_sections=3, num_spots=50,
                                      num_genes=24, patch_size=16, seed=2)
    cfg = ModelConfig(encoder_name="tiny_cnn", image_dim=128, spot_dim=24,
                      projection_dim=16, heads_num=2, heads_dim=8,
                      head_layers=1)
    sample = {
        "image": np.zeros((1, 16, 16, 3), np.float32),
        "expression": sections[0].expression[:1],
        "position": sections[0].positions[:1].astype(np.int32),
    }
    model, state = create_train_state(cfg, TrainConfig(batch_size=8), sample)
    return sections, model, state


def test_sharded_sweep_matches_single_device(setup):
    sections, model, state = setup
    assert len(jax.devices()) >= 8
    mesh = make_mesh((8,), ("data",))

    img1, spot1 = embed.compute_embeddings(
        model, state.params, state.batch_stats, sections, batch_size=8
    )
    # image_batch_size=8 keeps the image tower on the sharded path at this
    # tiny N (the production default max(bs, 256) would route it all through
    # the unsharded tail here).
    img8, spot8 = embed.compute_embeddings_sharded(
        model, state.params, state.batch_stats, sections, mesh, batch_size=8,
        image_batch_size=8,
    )
    assert img8.shape == img1.shape and spot8.shape == spot1.shape
    np.testing.assert_allclose(img8, img1, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(spot8, spot1, rtol=2e-5, atol=2e-6)


def test_sharded_sweep_does_not_close_over_params(setup):
    """The compiled sweep takes params as ARGUMENTS: a second call with
    different params must produce different embeddings from the same cached
    executable (a closure capture would bake the first fold's weights in —
    and, on the real TPU, blow the remote-compile request size;
    ADVICE r2 #1)."""
    import jax

    sections, model, state = setup
    mesh = make_mesh((8,), ("data",))
    kwargs = dict(batch_size=8, image_batch_size=8)
    img_a, _ = embed.compute_embeddings_sharded(
        model, state.params, state.batch_stats, sections, mesh, **kwargs
    )
    params2 = jax.tree.map(lambda x: x * 1.5, state.params)
    img_b, _ = embed.compute_embeddings_sharded(
        model, params2, state.batch_stats, sections, mesh, **kwargs
    )
    assert not np.allclose(img_a, img_b)
    # and the program cache is shared across calls (no per-fold re-trace)
    s1 = embed._make_sharded_sweep(model, False, mesh, "data")
    s2 = embed._make_sharded_sweep(model, False, mesh, "data")
    assert s1 is s2


def test_eval_sweep_rebinds_to_concat_materialization(setup):
    """Forward-only sweeps rebind measured-slow dense-block impls to CONCAT
    (pure piecewise: 3,104 vs ~4,810 spots/s on-chip, PROFILE_r03.md) while
    the shipping piecewise8 passes through. The impls share one param tree,
    so the rebind is transparent to weights — asserted on a REAL densenet
    tower (tiny_densenet), where dense_block_impl actually reaches a
    DenseBlock and the rebound program consumes piecewise-built params."""
    import dataclasses

    from mclstexp_tpu.config import ModelConfig, TrainConfig
    from mclstexp_tpu.train.state import create_train_state

    sections, *_ = setup
    cfg = ModelConfig(
        encoder_name="tiny_densenet", image_dim=16, spot_dim=24,
        projection_dim=16, heads_num=2, heads_dim=8, head_layers=1,
        dense_block_impl="piecewise",
    )
    sample = {
        "image": np.zeros((1, 16, 16, 3), np.float32),
        "expression": sections[0].expression[:1],
        "position": sections[0].positions[:1].astype(np.int32),
    }
    pw, state = create_train_state(cfg, TrainConfig(batch_size=8), sample)
    ev = embed._eval_model(pw)
    assert ev.config.dense_block_impl == "concat"
    assert embed._eval_model(ev) is ev  # concat models pass through untouched
    # the shipping bundled impl is measured fast forward -> passes through
    pw8 = type(pw)(dataclasses.replace(cfg, dense_block_impl="piecewise8"))
    assert embed._eval_model(pw8) is pw8

    img_pw, spot_pw = embed.compute_embeddings(
        pw, state.params, state.batch_stats, sections, batch_size=8
    )
    img_cc, spot_cc = embed.compute_embeddings(
        ev, state.params, state.batch_stats, sections, batch_size=8
    )
    np.testing.assert_array_equal(img_pw, img_cc)
    np.testing.assert_array_equal(spot_pw, spot_cc)
    # and the rebind changed the program, not just the label: the piecewise
    # program on the same params differs by fp-reassociation noise
    sweep = embed._make_sweep(pw, False, False)
    img_raw = np.asarray(sweep(
        state.params, state.batch_stats,
        (embed.prepare_eval_arrays(sections)["patches"],),
        sum(s.num_spots for s in sections), 8, "image",
        __import__("jax").random.PRNGKey(0),
    ))
    np.testing.assert_allclose(img_raw, img_cc, rtol=2e-4, atol=2e-5)


def test_sharded_sweep_small_n(setup):
    """Fewer spots than one global batch round: everything lands in the
    padded first round + remainder path."""
    sections, model, state = setup
    mesh = make_mesh((8,), ("data",))
    tiny = sections[:1]
    img1, spot1 = embed.compute_embeddings(
        model, state.params, state.batch_stats, tiny, batch_size=8
    )
    img8, spot8 = embed.compute_embeddings_sharded(
        model, state.params, state.batch_stats, tiny, mesh, batch_size=8,
        image_batch_size=8,
    )
    np.testing.assert_allclose(img8, img1, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(spot8, spot1, rtol=2e-5, atol=2e-6)
