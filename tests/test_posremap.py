"""Dense positional-coordinate remap (data/posremap.py) — the visium fix.

The reference feeds RAW PIXEL coords into nn.Embedding(65536, d) x/y tables
(reference ``dataset.py:316-341``, ``model.py:204-205``); the remap rewrites
observed values to dense row ids at load time. These tests pin the claim
that this is EXACT, not approximate: a compact model whose table rows are
the full model's rows gathered at the observed values is bit-identical on
every observed coordinate — forward, loss, and a full torch-Adam train step
(elementwise optimizer + per-row embedding gradients make each row's update
independent of every other row)."""

import dataclasses

import jax
import numpy as np
import pytest

from mclstexp_tpu.config import ModelConfig, TrainConfig
from mclstexp_tpu.data.posremap import PosRemap
from mclstexp_tpu.data.section import Section
from mclstexp_tpu.train.state import create_train_state
from mclstexp_tpu.train.step import make_train_step


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _sections(rng, n=2, spots=20, genes=6, coord_max=50_000):
    out = []
    for i in range(n):
        pos = rng.integers(0, coord_max, size=(spots, 2)).astype(np.int32)
        out.append(
            Section(
                name=f"S{i}",
                expression=rng.normal(size=(spots, genes)).astype(np.float32),
                positions=pos,
                centers=pos.copy(),
            )
        )
    return out


def test_build_apply_roundtrip(rng):
    secs = _sections(rng)
    remap = PosRemap.build(secs, align=16)
    assert remap.vocab % 16 == 0
    assert remap.vocab >= max(len(remap.x_values), len(remap.y_values))
    assert (np.diff(remap.x_values) > 0).all()  # sorted distinct

    remapped = remap.apply_sections(secs)
    for s, r in zip(secs, remapped):
        assert r.positions.dtype == np.int32
        assert (r.positions < remap.vocab).all()
        # dense ids map back to the original raw values
        np.testing.assert_array_equal(
            remap.x_values[r.positions[:, 0]], s.positions[:, 0]
        )
        np.testing.assert_array_equal(
            remap.y_values[r.positions[:, 1]], s.positions[:, 1]
        )
        # originals untouched (apply_sections replaces, never mutates)
        assert s.positions.max() >= remap.vocab or len(remap.x_values) > s.num_spots


def test_determinism_and_unseen_raise(rng):
    secs = _sections(rng)
    a, b = PosRemap.build(secs), PosRemap.build(list(reversed(secs)))
    np.testing.assert_array_equal(a.x_values, b.x_values)  # order-independent
    assert a.vocab == b.vocab

    with pytest.raises(ValueError, match="unseen x"):
        a.apply(np.array([[999_999, int(a.y_values[0])]]))
    with pytest.raises(ValueError, match="unseen y"):
        a.apply(np.array([[int(a.x_values[0]), 999_999]]))


def test_save_load(tmp_path, rng):
    remap = PosRemap.build(_sections(rng))
    p = str(tmp_path / "pos_remap.npz")
    remap.save(p)
    back = PosRemap.load(p)
    assert back.vocab == remap.vocab
    np.testing.assert_array_equal(back.x_values, remap.x_values)
    np.testing.assert_array_equal(back.y_values, remap.y_values)


def test_scatter_slice_roundtrip(rng):
    remap = PosRemap.build(_sections(rng), align=16)
    d = 8
    compact = rng.normal(size=(remap.vocab, d)).astype(np.float32)
    for scatter, slice_, values in (
        (remap.scatter_x, remap.slice_x, remap.x_values),
        (remap.scatter_y, remap.slice_y, remap.y_values),
    ):
        full = scatter(compact, 65536)
        assert full.shape == (65536, d)
        np.testing.assert_array_equal(full[values], compact[: len(values)])
        back = slice_(full)
        assert back.shape == (remap.vocab, d)
        np.testing.assert_array_equal(back[: len(values)], compact[: len(values)])
        # unobserved full rows are zero (unreachable)
        mask = np.ones(65536, bool)
        mask[values] = False
        assert not full[mask].any()


def _derive_compact_params(full_tree, compact_tree, remap):
    """Compact params = full params with pos tables gathered at the observed
    values (everything else is shape-identical and copied verbatim)."""

    def walk(full, compact, path=()):
        if not isinstance(full, dict):
            if path[-2:] == ("pos", "x_embed") or path[-1] == "x_embed":
                return remap.slice_x(np.asarray(full))
            if path[-2:] == ("pos", "y_embed") or path[-1] == "y_embed":
                return remap.slice_y(np.asarray(full))
            return full
        return {k: walk(full[k], compact[k], (*path, k)) for k in full}

    return walk(full_tree, compact_tree)


def test_whole_model_bit_equality_one_train_step(rng):
    """Full-vocab model vs remapped compact model: identical loss and
    identical parameters after one full augmented train step (torch-Adam,
    coupled L2) — on every parameter, with pos tables compared per observed
    coordinate. This is the exactness claim behind the visium preset's
    pos_remap (VERDICT r3 next #2)."""
    full_vocab, batch, genes, patch = 512, 8, 12, 16
    raw_pos = rng.choice(full_vocab, size=(batch, 2), replace=True).astype(np.int32)
    sec = Section(
        name="S0",
        expression=rng.normal(size=(batch, genes)).astype(np.float32),
        positions=raw_pos,
        centers=raw_pos.copy(),
    )
    remap = PosRemap.build([sec], align=8)
    assert remap.vocab < full_vocab  # the whole point

    mcfg = ModelConfig(
        encoder_name="tiny_cnn", image_dim=128, spot_dim=genes,
        projection_dim=8, heads_num=2, heads_dim=4, head_layers=1,
        pos_vocab=full_vocab,
    )
    tcfg = TrainConfig(batch_size=batch, lr=1e-3, weight_decay=1e-3, seed=0)

    image_u8 = rng.integers(0, 255, size=(batch, patch, patch, 3), dtype=np.uint8)
    sample = {
        "image": image_u8[:1].astype(np.float32) / 255.0,
        "expression": sec.expression[:1],
        "position": raw_pos[:1],
    }
    model_full, state_full = create_train_state(mcfg, tcfg, sample)

    ccfg = dataclasses.replace(mcfg, pos_vocab=remap.vocab)
    model_c, state_c = create_train_state(ccfg, tcfg, sample)
    state_c = state_c.replace(
        params=_derive_compact_params(state_full.params, state_c.params, remap),
        batch_stats=state_full.batch_stats,
    )

    key = jax.random.PRNGKey(3)
    batch_full = {"image_u8": image_u8, "expression": sec.expression,
                  "position": raw_pos}
    batch_c = {**batch_full, "position": remap.apply(raw_pos)}

    # augment_mode="st" runs the full jitted step incl. on-device
    # augmentation; the same key drives identical augmented images.
    step_full = make_train_step(model_full, augment_mode="st", donate=False)
    step_c = make_train_step(model_c, augment_mode="st", donate=False)
    new_full, loss_full = step_full(state_full, batch_full, key)
    new_c, loss_c = step_c(state_c, batch_c, key)

    assert float(loss_full) == float(loss_c)  # bitwise

    flat_full = jax.tree_util.tree_flatten_with_path(new_full.params)[0]
    flat_c = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_flatten_with_path(new_c.params)[0]}
    for path, leaf_full in flat_full:
        name = jax.tree_util.keystr(path)
        leaf_c = np.asarray(flat_c[name])
        leaf_full = np.asarray(leaf_full)
        if "x_embed" in name:
            np.testing.assert_array_equal(
                leaf_full[remap.x_values], leaf_c[: len(remap.x_values)],
                err_msg=name)
        elif "y_embed" in name:
            np.testing.assert_array_equal(
                leaf_full[remap.y_values], leaf_c[: len(remap.y_values)],
                err_msg=name)
        else:
            np.testing.assert_array_equal(leaf_full, leaf_c, err_msg=name)


def test_reference_tables_remap_bit_equality(rng):
    """Reference-checkpoint semantics: spot encodings from (65536-style) full
    tables vs remap-gathered compact tables are bit-identical for scattered
    raw coords — the torch-import `pos_remap` gather path's contract
    (models/image/torch_import.py), mirroring the prefix-exactness test
    (test_torch_import.py::test_pos_vocab_prefix_is_exact)."""
    import jax.numpy as jnp

    from mclstexp_tpu.models.mclstexp import MclSTExp

    spot_dim, full_vocab, n = 12, 256, 6
    raw_pos = rng.choice(full_vocab, size=(n, 2), replace=False).astype(np.int32)
    sec = Section(name="S", expression=np.zeros((n, spot_dim), np.float32),
                  positions=raw_pos, centers=raw_pos.copy())
    remap = PosRemap.build([sec], align=8)

    x_tab = rng.normal(size=(full_vocab, spot_dim)).astype(np.float32)
    y_tab = rng.normal(size=(full_vocab, spot_dim)).astype(np.float32)
    expr = jnp.asarray(rng.normal(size=(n, spot_dim)).astype(np.float32))

    outs = {}
    for vocab, tabs, pos in (
        (full_vocab, (x_tab, y_tab), raw_pos),
        (remap.vocab, (remap.slice_x(x_tab), remap.slice_y(y_tab)),
         remap.apply(raw_pos)),
    ):
        cfg = ModelConfig(
            encoder_name="tiny_cnn", image_dim=128, spot_dim=spot_dim,
            projection_dim=8, heads_num=2, heads_dim=4, head_layers=1,
            pos_vocab=vocab,
        )
        model = MclSTExp(cfg)
        batch = {"image": jnp.zeros((n, 16, 16, 3)), "expression": expr,
                 "position": jnp.asarray(pos)}
        variables = model.init(jax.random.PRNGKey(0), batch)
        params = jax.tree_util.tree_map(lambda x: x, variables["params"])
        params["spot_encoder"]["pos"]["x_embed"] = jnp.asarray(tabs[0])
        params["spot_encoder"]["pos"]["y_embed"] = jnp.asarray(tabs[1])
        outs[vocab] = np.asarray(model.apply(
            {"params": params}, expr, jnp.asarray(pos),
            method=MclSTExp.encode_spots,
        ))
    np.testing.assert_array_equal(outs[full_vocab], outs[remap.vocab])


# --------------------------------------------------- CLI remap plumbing --


def test_cli_maybe_remap_prefers_saved(tmp_path, rng):
    """Checkpoint-consuming commands load the pos_remap.npz persisted at
    train time: the mapping DEFINES the checkpoint's table rows, and a
    rebuild over drifted sections would silently permute them (round-4
    review finding). Without prefer_saved (fresh training) the mapping is
    rebuilt from the loaded sections."""
    from mclstexp_tpu.cli.main import _maybe_remap
    from mclstexp_tpu.config import get_config

    secs = _sections(rng)
    cfg = get_config("visium")  # the pos_remap=True preset
    assert cfg.data.pos_remap
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, checkpoint_dir=str(tmp_path))
    )

    # the persisted remap was built over a superset of coordinates (the
    # drift scenario: a section present at train time is missing now)
    saved = PosRemap.build(secs + _sections(rng, n=1))
    d = tmp_path / cfg.data.dataset
    d.mkdir()
    saved.save(str(d / "pos_remap.npz"))
    fresh = PosRemap.build(secs)
    assert not np.array_equal(fresh.x_values, saved.x_values)

    cfg2, remapped, remap = _maybe_remap(cfg, secs, prefer_saved=True)
    np.testing.assert_array_equal(remap.x_values, saved.x_values)
    assert cfg2.model.pos_vocab == saved.vocab
    # row ids follow the SAVED mapping exactly
    np.testing.assert_array_equal(
        saved.x_values[remapped[0].positions[:, 0]], secs[0].positions[:, 0]
    )

    _, _, remap_train = _maybe_remap(cfg, secs, prefer_saved=False)
    np.testing.assert_array_equal(remap_train.x_values, fresh.x_values)


def test_find_saved_remap(tmp_path):
    from mclstexp_tpu.cli.main import _find_saved_remap

    ck = tmp_path / "visium" / "S1" / "best_0"
    ck.mkdir(parents=True)
    assert _find_saved_remap(str(ck)) is None
    p = tmp_path / "visium" / "pos_remap.npz"
    p.write_bytes(b"")
    assert _find_saved_remap(str(ck)) == str(p)


def test_export_torch_refuses_without_remap(tmp_path):
    """Exporting a pos_remap-preset checkpoint without the mapping would
    write compact dense-row tables at raw-coordinate positions — a .pt that
    loads cleanly into the reference but is silently corrupt. The CLI must
    refuse unless the persisted npz is found or --pos-remap/--no-pos-remap
    is given (round-4 review finding)."""
    from mclstexp_tpu.cli.main import main as cli_main

    ck = tmp_path / "model_result" / "visium" / "S1" / "best_0"
    ck.mkdir(parents=True)
    with pytest.raises(SystemExit, match="pos_remap"):
        cli_main(["export-torch", "--dataset", "visium",
                  "--checkpoint", str(ck), "--out", str(tmp_path / "m.pt")])


def test_export_torch_no_pos_remap_flag_skips_guard(tmp_path):
    """--no-pos-remap (full 65536-row checkpoint) must bypass the refusal;
    the failure then comes from the (empty) checkpoint itself."""
    from mclstexp_tpu.cli.main import main as cli_main

    ck = tmp_path / "ck"
    ck.mkdir()
    with pytest.raises(Exception) as ei:
        cli_main(["export-torch", "--dataset", "visium", "--no-pos-remap",
                  "--checkpoint", str(ck), "--out", str(tmp_path / "m.pt")])
    assert not (isinstance(ei.value, SystemExit)
                and "pos_remap" in str(ei.value))
