"""Baseline family tests: graph construction, NB/ZINB/CLIP losses (torch
goldens), model forwards, mask correctness, and a learnability smoke run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mclstexp_tpu.baselines import graph, losses, super_resolution
from mclstexp_tpu.baselines.models import BLEEP, Hist2ST, HisToGene, THItoGene
from mclstexp_tpu.baselines.trainer import (
    BaselineConfig,
    evaluate_baseline_fold,
    init_baseline,
    make_bleep_step,
    pad_slide,
    predict_slide,
    train_baseline_fold,
)
from mclstexp_tpu.data import synthetic
from mclstexp_tpu.utils.logging import MetricLogger


# ------------------------------------------------------------------ graph --


def np_calcadj_golden(coords, k, prune):
    """Direct per-spot implementation of the reference adjacency semantics."""
    from scipy.spatial import distance

    n = len(coords)
    adj = np.zeros((n, n), np.float32)
    for i in range(n):
        dist = distance.cdist(coords[i : i + 1], coords, "euclidean")[0]
        res = np.argsort(dist)
        for j in range(1, k + 1):
            if prune == "grid":
                if dist[res[j]] <= 2.0:
                    adj[i, res[j]] = 1.0
            else:
                adj[i, res[j]] = 1.0
    return adj


@pytest.mark.parametrize("prune", ["grid", "none"])
def test_knn_adjacency_matches_golden(prune):
    xs, ys = np.meshgrid(np.arange(5), np.arange(5))
    coords = np.stack([xs.ravel(), ys.ravel()], 1).astype(float)
    got = graph.knn_adjacency(coords, k=4, prune=prune)
    expected = np_calcadj_golden(coords, 4, prune)
    # ties in distance can order differently; compare degree and symmetry of
    # the grid case where distances are unique per neighbor class
    if prune == "grid":
        np.testing.assert_array_equal(got, expected)
    else:
        np.testing.assert_array_equal(got.sum(1), expected.sum(1))


# ----------------------------------------------------------------- losses --


def test_nb_loss_matches_torch(rng):
    torch = pytest.importorskip("torch")

    x = rng.poisson(3.0, size=(6, 9)).astype(np.float32)
    hr = rng.normal(size=(6, 9)).astype(np.float32)
    hp = rng.normal(size=(6, 9)).astype(np.float32)

    tx, tr, tp = map(torch.tensor, (x, hr, hp))
    ll = torch.lgamma(torch.exp(tr) + tx) - torch.lgamma(torch.exp(tr))
    ll += tp * tx - torch.log(torch.exp(tp) + 1) * (tx + torch.exp(tr))
    expected = float(-torch.mean(torch.sum(ll, axis=-1)))

    got = float(losses.nb_loss(jnp.asarray(x), jnp.asarray(hr), jnp.asarray(hp)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_zinb_loss_matches_torch(rng):
    torch = pytest.importorskip("torch")

    n, g = 5, 7
    x = rng.poisson(2.0, size=(n, g)).astype(np.float32)
    mean = np.abs(rng.normal(size=(n, g))).astype(np.float32) + 0.1
    disp = np.abs(rng.normal(size=(n, g))).astype(np.float32) + 0.1
    pi = rng.uniform(0.05, 0.95, size=(n, g)).astype(np.float32)
    sf = rng.uniform(0.5, 2.0, size=(n,)).astype(np.float32)

    eps = 1e-10
    tx, tm, td, tpi = map(torch.tensor, (x, mean, disp, pi))
    tm = tm * torch.tensor(sf)[:, None]
    t1 = torch.lgamma(td + eps) + torch.lgamma(tx + 1.0) - torch.lgamma(tx + td + eps)
    t2 = (td + tx) * torch.log(1.0 + tm / (td + eps)) + tx * (
        torch.log(td + eps) - torch.log(tm + eps)
    )
    nb_case = t1 + t2 - torch.log(1.0 - tpi + eps)
    zero_nb = torch.pow(td / (td + tm + eps), td)
    zero_case = -torch.log(tpi + (1.0 - tpi) * zero_nb + eps)
    expected = float(torch.mean(torch.where(tx <= 1e-8, zero_case, nb_case)))

    got = float(
        losses.zinb_loss(
            jnp.asarray(x), jnp.asarray(mean), jnp.asarray(disp), jnp.asarray(pi),
            jnp.asarray(sf),
        )
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_nb_zinb_loss_mask_pad_exact(rng):
    """Masked NB/ZINB on a pad-extended batch equal the unmasked losses on
    the real rows — pad rows contribute nothing to value OR normalizer (the
    reference trains unpadded dynamic shapes, NB_module.py:18-46; without
    the mask a pad row's strictly positive zero_case dilutes the mean)."""
    n, g, pad = 6, 9, 5
    x = rng.poisson(3.0, size=(n, g)).astype(np.float32)
    hr = rng.normal(size=(n, g)).astype(np.float32)
    hp = rng.normal(size=(n, g)).astype(np.float32)
    mean = np.abs(rng.normal(size=(n, g))).astype(np.float32) + 0.1
    disp = np.abs(rng.normal(size=(n, g))).astype(np.float32) + 0.1
    pi = rng.uniform(0.05, 0.95, size=(n, g)).astype(np.float32)
    sf = rng.uniform(0.5, 2.0, size=(n,)).astype(np.float32)

    def padded(a, value=0.0):
        w = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.asarray(np.pad(a, w, constant_values=value))

    mask = jnp.concatenate([jnp.ones(n, bool), jnp.zeros(pad, bool)])
    want_nb = float(losses.nb_loss(jnp.asarray(x), jnp.asarray(hr), jnp.asarray(hp)))
    got_nb = float(losses.nb_loss(padded(x), padded(hr), padded(hp), mask=mask))
    np.testing.assert_allclose(got_nb, want_nb, rtol=1e-6)

    want_z = float(losses.zinb_loss(
        jnp.asarray(x), jnp.asarray(mean), jnp.asarray(disp), jnp.asarray(pi),
        jnp.asarray(sf)))
    got_z = float(losses.zinb_loss(
        padded(x), padded(mean, 0.1), padded(disp, 0.1), padded(pi, 0.5),
        padded(sf, 1.0), mask=mask))
    np.testing.assert_allclose(got_z, want_z, rtol=1e-6)

    # all-true mask == no mask
    full = jnp.ones(n, bool)
    np.testing.assert_allclose(
        float(losses.nb_loss(jnp.asarray(x), jnp.asarray(hr), jnp.asarray(hp),
                             mask=full)), want_nb, rtol=1e-6)


def test_bleep_loss_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    b, d = 8, 6
    spot = rng.normal(size=(b, d)).astype(np.float32)
    img = rng.normal(size=(b, d)).astype(np.float32)
    T = 1.0

    ts, ti = torch.tensor(spot), torch.tensor(img)
    logits = (ts @ ti.T) / T
    targets = F.softmax(((ti @ ti.T + ts @ ts.T) / 2) / T, dim=-1)
    sl = (-targets * F.log_softmax(logits, dim=-1)).sum(1)
    il = (-targets.T * F.log_softmax(logits.T, dim=-1)).sum(1)
    expected = float(((sl + il) / 2.0).mean())

    got = float(losses.bleep_clip_loss(jnp.asarray(spot), jnp.asarray(img), T))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


# ----------------------------------------------------------------- models --


def test_histogene_forward_and_mask_equivalence(rng):
    n, g, p = 10, 12, 16
    model = HisToGene(n_genes=g, patch_size=p, dim=32, n_layers=1, heads=2, dropout=0.0)
    patches = jnp.asarray(rng.uniform(size=(n, p, p, 3)).astype(np.float32))
    pos = jnp.asarray(rng.integers(0, 64, size=(n, 2)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), patches, pos)
    out = model.apply(variables, patches, pos)
    assert out.shape == (n, g)

    # padded forward with mask must equal unpadded on the real rows
    pad = 6
    patches_p = jnp.concatenate([patches, jnp.zeros((pad, p, p, 3))])
    pos_p = jnp.concatenate([pos, jnp.zeros((pad, 2), jnp.int32)])
    mask = jnp.concatenate([jnp.ones(n, bool), jnp.zeros(pad, bool)])
    out_p = model.apply(variables, patches_p, pos_p, mask=mask)
    np.testing.assert_allclose(np.asarray(out_p[:n]), np.asarray(out), atol=1e-4)


def test_hist2st_forward(rng):
    n, g = 6, 10
    model = Hist2ST(n_genes=g, fig_size=56, patch_size=7, channel=16, depth1=1,
                    depth2=1, depth3=2, heads=2, dropout=0.0, zinb=True)
    patches = jnp.asarray(rng.uniform(size=(n, 56, 56, 3)).astype(np.float32))
    pos = jnp.asarray(rng.integers(0, 64, size=(n, 2)).astype(np.int32))
    adj = jnp.asarray(graph.knn_adjacency(np.asarray(pos), k=2, prune="none"))
    variables = model.init(jax.random.PRNGKey(0), patches, pos, adj)
    (pred, extra, h), _ = model.apply(
        variables, patches, pos, adj, train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert pred.shape == (n, g)
    m, d, pi = extra
    assert m.shape == (n, g) and np.all(np.asarray(m) > 0)
    assert np.all(np.asarray(pi) >= 0) and np.all(np.asarray(pi) <= 1)


def test_thitogene_forward(rng):
    n, g = 4, 8
    model = THItoGene(n_genes=g, patch_size=112, n_layers=1, caps=4, route_dim=16,
                      heads=(2, 2), dropout=0.0)
    patches = jnp.asarray(rng.uniform(size=(n, 112, 112, 3)).astype(np.float32))
    pos = jnp.asarray(rng.integers(0, 64, size=(n, 2)).astype(np.int32))
    adj = jnp.ones((n, n), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), patches, pos, adj)
    out = model.apply(variables, patches, pos, adj)
    assert out.shape == (n, g)
    assert np.all(np.isfinite(np.asarray(out)))


def test_bleep_gathered_loss_matches_full_batch(rng):
    """bleep_clip_loss_gathered under shard_map == bleep_clip_loss on the
    full batch: the soft targets' intra-modal similarities must span the
    GLOBAL batch (the DDP-parity objective, Bleep/BLEEP_main.py:76-78)."""
    from jax.sharding import PartitionSpec as P

    from mclstexp_tpu.parallel.mesh import make_mesh

    b, d, T = 16, 8, 0.7
    spot = rng.normal(size=(b, d)).astype(np.float32)
    img = rng.normal(size=(b, d)).astype(np.float32)
    full = float(losses.bleep_clip_loss(jnp.asarray(spot), jnp.asarray(img), T))

    mesh = make_mesh((8,), ("data",))
    sharded = jax.jit(
        jax.shard_map(
            lambda s, i: losses.bleep_clip_loss_gathered(s, i, T, "data"),
            mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P(),
            check_vma=False,
        )
    )(spot, img)
    np.testing.assert_allclose(float(sharded), full, rtol=1e-6)


def test_bleep_sharded_step_matches_replicated(rng):
    """One data-parallel BLEEP step on an 8-device mesh == the single-device
    step: same loss, and every updated param leaf equal (VERDICT r2 #4 —
    the reference's DDP-trained baseline, BLEEP_main.py:57,147)."""
    from mclstexp_tpu.parallel.mesh import make_mesh, shard_batch

    cfg = BaselineConfig(model="bleep", n_genes=16, encoder_name="tiny_cnn",
                         batch_size=16, max_epochs=1)
    sections = synthetic.make_dataset(num_sections=2, num_spots=16, num_genes=16,
                                      patch_size=16, seed=5)
    model, state = init_baseline(cfg, sections[0])
    step = make_bleep_step(model, cfg)
    batch = {
        "image_u8": np.asarray(sections[0].patches),
        "expression": np.asarray(sections[0].expression),
    }
    rng_key = jax.random.PRNGKey(3)

    # the step donates its state buffers; keep an independent copy
    state_b = jax.tree.map(jnp.array, state)
    state1, loss1 = step(state, {k: jnp.asarray(v) for k, v in batch.items()}, rng_key)

    mesh = make_mesh((8,), ("data",))
    state8, loss8 = step(state_b, shard_batch(batch, mesh), rng_key)

    np.testing.assert_allclose(float(loss8), float(loss1), rtol=2e-5)
    for (p1, a), (p8, b) in zip(
        jax.tree_util.tree_flatten_with_path(state1.params)[0],
        jax.tree_util.tree_flatten_with_path(state8.params)[0],
    ):
        assert p1 == p8
        # atol covers Adam's rsqrt amplification of reduction-order noise
        # on near-zero-gradient entries
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(p1),
        )


def test_bleep_train_fold_with_mesh(rng):
    """train_bleep_fold(mesh=...) runs the DP path end-to-end."""
    from mclstexp_tpu.baselines.trainer import train_bleep_fold
    from mclstexp_tpu.parallel.mesh import make_mesh

    sections = synthetic.make_dataset(num_sections=2, num_spots=16, num_genes=12,
                                      patch_size=16, seed=6)
    cfg = BaselineConfig(model="bleep", n_genes=12, encoder_name="tiny_cnn",
                         batch_size=8, max_epochs=1, seed=0)
    logger = MetricLogger(echo=False)
    model, state = train_bleep_fold(
        cfg, sections, 0, logger=logger, mesh=make_mesh((8,), ("data",))
    )
    assert any("loss" in r and np.isfinite(r["loss"]) for r in logger.records)


@pytest.mark.slow
def test_slide_dp_step_mean_of_per_slide_losses(rng):
    """make_slide_dp_step's loss == mean of the sequential per-slide losses
    from the same state and per-slide rngs (the torch-DDP-at-batch-1
    objective for the slide families)."""
    from mclstexp_tpu.baselines.trainer import (
        init_baseline, make_slide_dp_step, make_slide_step,
    )

    sections = synthetic.make_dataset(num_sections=4, num_spots=12,
                                      num_genes=8, patch_size=16, seed=9)
    cfg = BaselineConfig(model="histogene", n_genes=8, patch_size=16,
                         bucket=16, max_epochs=1)
    model, state = init_baseline(cfg, sections[0])
    padded = [pad_slide(s, 16, False, cfg) for s in sections]
    rngs = [jax.random.fold_in(jax.random.PRNGKey(1), i) for i in range(4)]

    seq_step = make_slide_step(model, cfg, donate=False)
    seq_losses = []
    for p, r in zip(padded, rngs):
        _, loss = seq_step(state, {k: jnp.asarray(v) for k, v in p.items()}, r)
        seq_losses.append(float(loss))

    dp_step = make_slide_dp_step(model, cfg, donate=False)
    stacked = {k: jnp.stack([np.asarray(p[k]) for p in padded]) for k in padded[0]}
    _, dp_loss = dp_step(state, stacked, jnp.stack(rngs))
    np.testing.assert_allclose(float(dp_loss), np.mean(seq_losses), rtol=2e-5)


@pytest.mark.slow
def test_slide_dp_sharded_matches_replicated(rng):
    """Slide-per-device DP over an 8-device mesh == the same vmapped step on
    one device: identical loss and updated params."""
    from mclstexp_tpu.baselines.trainer import init_baseline, make_slide_dp_step
    from mclstexp_tpu.parallel.mesh import make_mesh, shard_batch

    sections = synthetic.make_dataset(num_sections=8, num_spots=10,
                                      num_genes=8, patch_size=16, seed=10)
    cfg = BaselineConfig(model="histogene", n_genes=8, patch_size=16,
                         bucket=16, max_epochs=1)
    model, state = init_baseline(cfg, sections[0])
    state_b = jax.tree.map(jnp.array, state)
    padded = [pad_slide(s, 16, False, cfg) for s in sections]
    stacked = {k: np.stack([np.asarray(p[k]) for p in padded]) for k in padded[0]}
    rngs = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(2), i)
                      for i in range(8)])
    dp_step = make_slide_dp_step(model, cfg)

    state1, loss1 = dp_step(
        state, {k: jnp.asarray(v) for k, v in stacked.items()}, rngs
    )
    mesh = make_mesh((8,), ("data",))
    state8, loss8 = dp_step(state_b, shard_batch(stacked, mesh), rngs)
    np.testing.assert_allclose(float(loss8), float(loss1), rtol=2e-5)
    for (p1, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(state1.params)[0],
        jax.tree_util.tree_flatten_with_path(state8.params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(p1),
        )


@pytest.mark.slow
def test_hist2st_train_mode_pad_equivalence(rng):
    """TRAIN-mode padded forward == unpadded on the real rows, including the
    updated BN running stats. BN batch statistics are the only cross-patch
    channel in the conv trunk, and BatchNormT computes them over the masked
    samples only — so the pad-to-bucket scheme is exact even in train mode
    (the reference trains unpadded dynamic-shape slides)."""
    n, g, fig, pad = 9, 8, 14, 7
    model = Hist2ST(n_genes=g, fig_size=fig, patch_size=7, channel=16,
                    depth1=1, depth2=1, depth3=2, heads=2, dropout=0.0,
                    zinb=True)
    patches = jnp.asarray(rng.uniform(size=(n, fig, fig, 3)).astype(np.float32))
    pos = jnp.asarray(rng.integers(0, 64, size=(n, 2)).astype(np.int32))
    adj = jnp.asarray(graph.knn_adjacency(np.asarray(pos), k=3, prune="none"))
    variables = model.init(jax.random.PRNGKey(0), patches, pos, adj)

    (out, extra, h), upd = model.apply(
        variables, patches, pos, adj, train=True, mutable=["batch_stats"]
    )

    patches_p = jnp.concatenate([patches, jnp.zeros((pad, fig, fig, 3))])
    pos_p = jnp.concatenate([pos, jnp.zeros((pad, 2), jnp.int32)])
    adj_p = jnp.zeros((n + pad, n + pad), adj.dtype).at[:n, :n].set(adj)
    mask = jnp.concatenate([jnp.ones(n, bool), jnp.zeros(pad, bool)])
    (out_p, extra_p, h_p), upd_p = model.apply(
        variables, patches_p, pos_p, adj_p, train=True,
        mutable=["batch_stats"], mask=mask,
    )

    np.testing.assert_allclose(np.asarray(out_p[:n]), np.asarray(out),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_p[:n]), np.asarray(h),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(extra_p, extra):
        np.testing.assert_allclose(np.asarray(a[:n]), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(upd_p["batch_stats"])[0],
        jax.tree_util.tree_flatten_with_path(upd["batch_stats"])[0],
    ):
        # masked-sum vs plain-mean reduction trees differ in fp32 order
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-5,
            err_msg=f"bn{jax.tree_util.keystr(path)}",
        )


def test_gat_isolated_spot_pad_exact(rng):
    """A real spot with an all-zero adjacency row (possible under
    prune='grid' at tissue edges) degrades to a uniform softmax over the
    -9e15 fill — pad COLUMNS must sit strictly below that fill or the
    isolated spot attends uniformly over pads too (reference GATLayer.py
    never pads; round-4 review finding)."""
    from mclstexp_tpu.baselines.layers import MultiHeadGAT

    n, pad, f = 5, 3, 8
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    adj = np.ones((n, n), np.float32)
    adj[2, :] = 0.0  # isolated real spot
    adj[:, 2] = 0.0
    gat = MultiHeadGAT(nhid=4, out_features=6, heads=2, dropout=0.0, alpha=0.01)
    variables = gat.init(jax.random.PRNGKey(0), x, jnp.asarray(adj))
    out = gat.apply(variables, x, jnp.asarray(adj))

    x_p = jnp.concatenate([x, jnp.zeros((pad, f))])
    adj_p = np.zeros((n + pad, n + pad), np.float32)
    adj_p[:n, :n] = adj
    mask = jnp.concatenate([jnp.ones(n, bool), jnp.zeros(pad, bool)])
    out_p = gat.apply(variables, x_p, jnp.asarray(adj_p), mask=mask)
    np.testing.assert_allclose(np.asarray(out_p[:n]), np.asarray(out),
                               rtol=1e-5, atol=1e-6)


def test_cli_baseline_flag_fallthrough(monkeypatch, tmp_path):
    """Unset --weight_decay/--dropout/--temperature fall through to each
    family's reference defaults (the baseline subparser resets them to None
    sentinels); explicitly set flags win. Pins the round-4 fix — before it,
    the flagship parser defaults (wd 1e-3, dropout 0.0) were silently
    applied to every family."""
    from mclstexp_tpu.baselines import trainer as bt
    from mclstexp_tpu.cli.main import main as cli_main

    captured = {}

    class _Stop(Exception):
        pass

    def fake_train(cfg, sections, fold, logger=None, mesh=None):
        captured["cfg"] = cfg
        raise _Stop

    monkeypatch.setattr(bt, "train_baseline_fold", fake_train)
    base = ["baseline", "--baseline", "hist2st", "--dataset", "synthetic",
            "--checkpoint-dir", str(tmp_path), "--patch-cache",
            str(tmp_path / "pc"), "--no-save"]

    with pytest.raises(_Stop):
        cli_main(base)
    cfg = captured["cfg"]
    assert cfg.weight_decay is None  # -> family default via resolver
    assert bt.resolve_weight_decay(cfg) == bt._FAMILY_WD["hist2st"]
    assert cfg.dropout == 0.2 and cfg.temperature == 1.0

    with pytest.raises(_Stop):
        cli_main(base + ["--weight_decay", "0.01", "--dropout", "0.3"])
    cfg = captured["cfg"]
    assert bt.resolve_weight_decay(cfg) == pytest.approx(0.01)
    assert cfg.dropout == pytest.approx(0.3)


def _tiny_hist2st_setup(rng, n=7, g=8, fig=14, coef_head=True):
    """Tiny Hist2ST + one-slide batch dict for _slide_loss tests."""
    model = Hist2ST(n_genes=g, fig_size=fig, patch_size=7, channel=16,
                    depth1=1, depth2=1, depth3=2, heads=2, dropout=0.0,
                    zinb=True, coef_head=coef_head)
    patches = (rng.uniform(size=(n, fig, fig, 3)) * 255).astype(np.uint8)
    pos = rng.integers(0, 64, size=(n, 2)).astype(np.int32)
    adj = graph.knn_adjacency(pos.astype(float), k=3, prune="none")
    batch = {
        "patches": jnp.asarray(patches),
        "positions": jnp.asarray(pos),
        "expression": jnp.asarray(rng.normal(size=(n, g)).astype(np.float32)),
        "counts": jnp.asarray(rng.poisson(3.0, size=(n, g)).astype(np.float32)),
        "size_factors": jnp.asarray(rng.uniform(0.5, 2.0, size=n).astype(np.float32)),
        "adj": jnp.asarray(adj.astype(np.float32)),
        "mask": jnp.ones(n, bool),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["patches"].astype(jnp.float32) / 255.0, batch["positions"],
        batch["adj"], train=False, aug=coef_head,
    )
    return model, variables, batch


@pytest.mark.slow
def test_hist2st_slide_loss_pad_exact_with_zinb_and_bake(rng):
    """The FULL per-slide loss — masked MSE + masked ZINB aux + bake
    distillation with coef weighting and chained BN — is pad-exact: the
    padded slide's (loss, new_batch_stats) equal the unpadded slide's.
    Pins the round-4 mask fixes end to end (the reference trains unpadded,
    HIST2ST.py:155-171 + NB_module.py)."""
    from mclstexp_tpu.baselines.trainer import _slide_loss

    n, pad = 7, 9
    model, variables, batch = _tiny_hist2st_setup(rng, n=n)
    cfg = BaselineConfig(model="hist2st", zinb_coef=0.25, bake=1, lamb=0.5,
                         dropout=0.0, knn_k=3, knn_prune="none")
    key = jax.random.PRNGKey(7)

    loss, new_bs = _slide_loss(
        model, cfg, variables["params"], variables["batch_stats"], batch, key)

    def pad0(a, value=0):
        w = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.asarray(np.pad(np.asarray(a), w, constant_values=value))

    pbatch = {
        "patches": pad0(batch["patches"]),
        "positions": pad0(batch["positions"]),
        "expression": pad0(batch["expression"]),
        "counts": pad0(batch["counts"]),
        "size_factors": jnp.concatenate(
            [batch["size_factors"], jnp.ones(pad, jnp.float32)]),
        "adj": jnp.zeros((n + pad, n + pad), jnp.float32).at[:n, :n].set(batch["adj"]),
        "mask": jnp.concatenate([jnp.ones(n, bool), jnp.zeros(pad, bool)]),
    }
    loss_p, new_bs_p = _slide_loss(
        model, cfg, variables["params"], variables["batch_stats"], pbatch, key)

    np.testing.assert_allclose(float(loss_p), float(loss), rtol=5e-5)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(new_bs_p)[0],
        jax.tree_util.tree_flatten_with_path(new_bs)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-5,
            err_msg=f"bn{jax.tree_util.keystr(path)}")


@pytest.mark.slow
def test_hist2st_bake_chains_bn_stats(rng):
    """BN running stats CHAIN through the bake forwards — _slide_loss's
    returned batch_stats equal [main forward -> bake forward] applied
    sequentially, NOT the bake update computed from the initial stats
    (torch's aug() runs each bake in train mode so running_mean/var update
    1+bake times per step, HIST2ST.py:160-166)."""
    from mclstexp_tpu.baselines.trainer import _bake_augment, _slide_loss

    model, variables, batch = _tiny_hist2st_setup(rng)
    cfg = BaselineConfig(model="hist2st", zinb_coef=0.25, bake=1, lamb=0.5,
                         dropout=0.0, knn_k=3, knn_prune="none")
    key = jax.random.PRNGKey(11)
    _, new_bs = _slide_loss(
        model, cfg, variables["params"], variables["batch_stats"], batch, key)

    # manual chain with the exact rng plumbing _slide_loss uses
    drop_rng, bake_rng = jax.random.split(key)
    pats = batch["patches"].astype(jnp.float32) / 255.0
    args = (batch["positions"], batch["adj"])
    _, upd1 = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        pats, *args, train=True, mask=batch["mask"],
        mutable=["batch_stats"], rngs={"dropout": drop_rng})
    bs1 = upd1["batch_stats"]
    baked = _bake_augment(bake_rng, pats, 1)
    _, upd2 = model.apply(
        {"params": variables["params"], "batch_stats": bs1},
        baked[0], *args, train=True, mask=batch["mask"], aug=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.fold_in(drop_rng, 1)})
    bs2 = upd2["batch_stats"]

    leaves_got = jax.tree_util.tree_flatten_with_path(new_bs)[0]
    leaves_want = jax.tree_util.tree_flatten_with_path(bs2)[0]
    for (path, b), (_, a) in zip(leaves_got, leaves_want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7,
            err_msg=f"bn{jax.tree_util.keystr(path)}")
    # non-vacuous: the chain moved the stats between forward 1 and 2
    moved = any(
        not np.allclose(np.asarray(x), np.asarray(y))
        for (_, x), (_, y) in zip(
            jax.tree_util.tree_flatten_with_path(bs1)[0], leaves_want)
    )
    assert moved, "bake forward did not update BN stats; chaining untested"


@pytest.mark.slow
def test_thitogene_train_mode_pad_equivalence(rng):
    """Same train-mode pad exactness for THItoGene's ODConv/CapsNet BNs."""
    n, g, pad = 5, 8, 3
    model = THItoGene(n_genes=g, patch_size=112, dim=32, n_layers=1, caps=4,
                      route_dim=8, heads=(2, 2), dropout=0.0)
    patches = jnp.asarray(rng.uniform(size=(n, 112, 112, 3)).astype(np.float32))
    pos = jnp.asarray(rng.integers(0, 64, size=(n, 2)).astype(np.int32))
    adj = jnp.asarray(graph.knn_adjacency(np.asarray(pos), k=2, prune="none"))
    variables = model.init(jax.random.PRNGKey(0), patches, pos, adj)

    out, upd = model.apply(
        variables, patches, pos, adj, train=True, mutable=["batch_stats"]
    )
    patches_p = jnp.concatenate([patches, jnp.zeros((pad, 112, 112, 3))])
    pos_p = jnp.concatenate([pos, jnp.zeros((pad, 2), jnp.int32)])
    adj_p = jnp.zeros((n + pad, n + pad), adj.dtype).at[:n, :n].set(adj)
    mask = jnp.concatenate([jnp.ones(n, bool), jnp.zeros(pad, bool)])
    out_p, upd_p = model.apply(
        variables, patches_p, pos_p, adj_p, train=True,
        mutable=["batch_stats"], mask=mask,
    )
    np.testing.assert_allclose(np.asarray(out_p[:n]), np.asarray(out),
                               rtol=2e-4, atol=2e-5)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(upd_p["batch_stats"])[0],
        jax.tree_util.tree_flatten_with_path(upd["batch_stats"])[0],
    ):
        # masked-sum vs plain-mean reduction trees differ in fp32 order
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-5,
            err_msg=f"bn{jax.tree_util.keystr(path)}",
        )


@pytest.mark.slow
def test_hist2st_dp_step_with_bake_and_coef(rng):
    """The vmapped slide-DP step composes with Hist2ST's full aux losses —
    ZINB heads AND the bake distillation with its learned coef softmax
    weighting (aug=True applies per bake inside vmap): loss == mean of the
    sequential per-slide losses."""
    from mclstexp_tpu.baselines.trainer import (
        init_baseline, make_slide_dp_step, make_slide_step,
    )

    sections = synthetic.make_dataset(num_sections=2, num_spots=10,
                                      num_genes=8, patch_size=14, seed=13)
    cfg = BaselineConfig(model="hist2st", n_genes=8, patch_size=14,
                         bucket=16, zinb_coef=0.25, bake=1, lamb=0.5,
                         max_epochs=1)
    model, state = init_baseline(cfg, sections[0])
    assert model.coef_head
    padded = [pad_slide(s, 16, True, cfg) for s in sections]
    rngs = [jax.random.fold_in(jax.random.PRNGKey(3), i) for i in range(2)]

    seq_step = make_slide_step(model, cfg, donate=False)
    seq_losses = [
        float(seq_step(state, {k: jnp.asarray(v) for k, v in p.items()}, r)[1])
        for p, r in zip(padded, rngs)
    ]
    dp_step = make_slide_dp_step(model, cfg, donate=False)
    stacked = {k: jnp.stack([np.asarray(p[k]) for p in padded]) for k in padded[0]}
    _, dp_loss = dp_step(state, stacked, jnp.stack(rngs))
    np.testing.assert_allclose(float(dp_loss), np.mean(seq_losses), rtol=2e-5)


@pytest.mark.slow
def test_slide_dp_train_fold(rng):
    """train_baseline_fold(mesh=...) drives the slide-DP path end-to-end,
    including an uneven final chunk (3 train slides over an 8-wide mesh)."""
    from mclstexp_tpu.baselines.trainer import train_baseline_fold
    from mclstexp_tpu.parallel.mesh import make_mesh

    sections = synthetic.make_dataset(num_sections=4, num_spots=10,
                                      num_genes=8, patch_size=16, seed=12)
    cfg = BaselineConfig(model="histogene", n_genes=8, patch_size=16,
                         bucket=16, max_epochs=2)
    logger = MetricLogger(echo=False)
    model, state = train_baseline_fold(
        cfg, sections, 0, logger=logger, mesh=make_mesh((8,), ("data",)),
        slides_per_step=2,
    )
    losses = [r["loss"] for r in logger.records if "loss" in r]
    assert len(losses) == 2 and all(np.isfinite(l) for l in losses)


def test_bleep_forward_and_step(rng):
    cfg = BaselineConfig(model="bleep", n_genes=16, encoder_name="tiny_cnn",
                         batch_size=8, max_epochs=1, lr=1e-3)
    sections = synthetic.make_dataset(num_sections=2, num_spots=12, num_genes=16,
                                      patch_size=16)
    model, state = init_baseline(cfg, sections[0])
    step = make_bleep_step(model, cfg)
    batch = {
        "image_u8": jnp.asarray(np.asarray(sections[0].patches)[:8]),
        "expression": jnp.asarray(sections[0].expression[:8]),
    }
    state, loss = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


# ---------------------------------------------------------------- trainer --


@pytest.mark.slow
def test_histogene_training_learns(tmp_path):
    sections = synthetic.make_dataset(num_sections=3, num_spots=24, num_genes=12,
                                      patch_size=16, seed=3)
    cfg = BaselineConfig(model="histogene", n_genes=12, patch_size=16,
                         max_epochs=15, lr=3e-4, bucket=32, seed=0)
    logger = MetricLogger(echo=False)

    model, state0 = init_baseline(cfg, sections[1])
    before = evaluate_baseline_fold(cfg, sections, 0, model, state0)
    model, state = train_baseline_fold(cfg, sections, 0, logger=logger)
    after = evaluate_baseline_fold(cfg, sections, 0, model, state)
    assert after["mse"] < before["mse"]
    pred = predict_slide(model, state, sections[0], cfg)
    assert pred.shape == (24, 12)


def test_family_protocol_defaults():
    """Reference training-protocol defaults resolve per family, taken from
    each family's RUNNABLE flow (not constructor/argparse defaults its entry
    never uses): HisToGene tutorial.ipynb trains n_layers=8 / lr 1e-5 /
    100 epochs; THItoGene train.py:19-23,92 uses lr 1e-5, 300 epochs,
    n_layers 4 her2st / 8 cscc; Hist2ST Adam 1e-5 + StepLR(50, 0.9) +
    bake=5, 350 epochs (HIST2ST_train.py:17,21,24; HIST2ST.py:237);
    BLEEP AdamW 1e-3/wd 1e-3, 4 epochs (Bleep/config.py:7-8,
    BLEEP_main.py:20)."""
    from mclstexp_tpu.baselines.trainer import (
        baseline_optimizer,
        resolve_bake,
        resolve_epochs,
        resolve_lr,
        resolve_n_layers,
        resolve_weight_decay,
    )

    assert resolve_lr(BaselineConfig(model="histogene")) == 1e-5
    assert resolve_lr(BaselineConfig(model="thitogene")) == 1e-5
    assert resolve_lr(BaselineConfig(model="hist2st")) == 1e-5
    assert resolve_lr(BaselineConfig(model="bleep")) == 1e-3
    assert resolve_epochs(BaselineConfig(model="histogene")) == 100
    assert resolve_epochs(BaselineConfig(model="hist2st")) == 350
    assert resolve_epochs(BaselineConfig(model="thitogene")) == 300
    assert resolve_epochs(BaselineConfig(model="bleep")) == 4
    assert resolve_epochs(BaselineConfig(model="bleep", max_epochs=7)) == 7
    assert resolve_n_layers(BaselineConfig(model="histogene")) == 8
    assert resolve_n_layers(BaselineConfig(model="thitogene")) == 4
    assert resolve_n_layers(BaselineConfig(model="thitogene", n_layers=8)) == 8
    assert resolve_weight_decay(BaselineConfig(model="bleep")) == 1e-3
    assert resolve_weight_decay(BaselineConfig(model="hist2st")) == 0.0
    assert resolve_bake(BaselineConfig(model="hist2st")) == 5
    assert resolve_bake(BaselineConfig(model="histogene")) == 0
    assert resolve_bake(BaselineConfig(model="hist2st", bake=2)) == 2
    # explicit lr overrides the family default
    assert resolve_lr(BaselineConfig(model="hist2st", lr=3e-4)) == 3e-4

    # StepLR semantics: lr * 0.9^(epoch // 50), epoch = step // steps_per_epoch.
    # Drive the chain with a constant gradient; Adam's steady-state update
    # magnitude equals the lr, so the 0.9x drop lands exactly at epoch 50.
    cfg = BaselineConfig(model="hist2st")
    tx = baseline_optimizer(cfg, steps_per_epoch=2)
    params = {"w": jnp.ones((3,))}
    opt_state = tx.init(params)
    g = {"w": jnp.ones((3,))}
    mags = []
    for _ in range(101):
        updates, opt_state = tx.update(g, opt_state, params)
        mags.append(float(jnp.abs(updates["w"][0])))
    # Adam's moment warmup settles quickly; steady-state magnitude == lr
    assert np.isclose(mags[98], 1e-5, rtol=1e-3)
    assert np.isclose(mags[100], 0.9e-5, rtol=1e-3)


@pytest.mark.slow
def test_hist2st_training_learns():
    sections = synthetic.make_dataset(num_sections=3, num_spots=16, num_genes=8,
                                      patch_size=14, seed=7)
    cfg = BaselineConfig(model="hist2st", n_genes=8, patch_size=14, bucket=16,
                         max_epochs=10, lr=3e-4, bake=1, zinb_coef=0.25,
                         seed=0)
    model, state0 = init_baseline(cfg, sections[1])
    before = evaluate_baseline_fold(cfg, sections, 0, model, state0)
    model, state = train_baseline_fold(cfg, sections, 0,
                                       logger=MetricLogger(echo=False))
    after = evaluate_baseline_fold(cfg, sections, 0, model, state)
    assert after["mse"] < before["mse"]


@pytest.mark.slow
def test_thitogene_training_learns():
    # THItoGene's ODConv+capsnet stack needs the reference patch size (112px,
    # THItoGene/dataset.py fig_size); smaller patches collapse to 0 spatial.
    sections = synthetic.make_dataset(num_sections=3, num_spots=12, num_genes=8,
                                      patch_size=112, seed=9)
    cfg = BaselineConfig(model="thitogene", n_genes=8, patch_size=112, bucket=16,
                         max_epochs=6, lr=3e-4, seed=0)
    model, state0 = init_baseline(cfg, sections[1])
    before = evaluate_baseline_fold(cfg, sections, 0, model, state0)
    model, state = train_baseline_fold(cfg, sections, 0,
                                       logger=MetricLogger(echo=False))
    after = evaluate_baseline_fold(cfg, sections, 0, model, state)
    assert after["mse"] < before["mse"]


def test_bleep_training_learns():
    from mclstexp_tpu.baselines.trainer import bleep_embeddings, train_bleep_fold

    sections = synthetic.make_dataset(num_sections=3, num_spots=16, num_genes=12,
                                      patch_size=16, seed=11)
    cfg = BaselineConfig(model="bleep", n_genes=12, encoder_name="tiny_cnn",
                         batch_size=16, max_epochs=12, seed=0)
    logger = MetricLogger(echo=False)
    model, state = train_bleep_fold(cfg, sections, 0, logger=logger)
    losses_seen = [r["loss"] for r in logger.records if "loss" in r]
    assert losses_seen[-1] < losses_seen[0]
    img, spot = bleep_embeddings(model, state, sections, batch_size=16)
    assert img.shape == spot.shape == (48, 256)
    assert np.all(np.isfinite(img)) and np.all(np.isfinite(spot))


@pytest.mark.slow
def test_hist2st_training_step_with_zinb_and_bake():
    """One Hist2ST slide step incl. ZINB aux loss and bake distillation."""
    from mclstexp_tpu.baselines.trainer import init_baseline, make_slide_step

    sections = synthetic.make_dataset(num_sections=2, num_spots=10, num_genes=8,
                                      patch_size=14, seed=5)
    cfg = BaselineConfig(model="hist2st", n_genes=8, patch_size=14, bucket=16,
                         zinb_coef=0.25, bake=2, lamb=0.5, lr=1e-4, max_epochs=1)
    # hist2st dims: fig 14 / patch 7 -> (2*2)*32//8 = 16-d tokens
    model, state = init_baseline(cfg, sections[0])
    step = make_slide_step(model, cfg)
    batch = {k: jnp.asarray(v) for k, v in
             pad_slide(sections[0], 16, with_adj=True, cfg=cfg).items()}
    state, loss = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    state, loss2 = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss2))


def test_pad_slide_shapes():
    sections = synthetic.make_dataset(num_sections=1, num_spots=10, num_genes=6,
                                      patch_size=8)
    cfg = BaselineConfig(model="hist2st", n_genes=6, bucket=16)
    out = pad_slide(sections[0], 16, with_adj=True, cfg=cfg)
    assert out["patches"].shape[0] == 16
    assert out["mask"].sum() == 10
    assert out["adj"].shape == (16, 16)
    assert out["adj"][10:, :].sum() == 0 and out["adj"][:, 10:].sum() == 0
    assert "counts" in out and out["size_factors"].shape == (16,)


# ------------------------------------------------------- super-resolution --


def test_sr_grid():
    centers = np.array([[100, 200], [1000, 1400]])
    gc, gp = super_resolution.sr_grid(centers)
    assert gc[:, 0].min() >= 100 and gc[:, 0].max() < 1000
    assert gc[:, 1].min() >= 200 and gc[:, 1].max() < 1400
    # 56-px steps
    assert np.all(np.diff(np.unique(gc[:, 0])) == 56)
    assert gp.min() >= 0


def test_jk_lstm_matches_torch_two_layer_lstm(rng):
    """Hist2ST's jump-knowledge uses two stacked flax OptimizedLSTMCell RNNs
    standing in for the reference's ``nn.LSTM(dim, dim, 2)``
    (HIST2ST.py:48,63); cross-check numerically: identical weights must give
    identical sequence outputs (VERDICT r1 weak #6)."""
    torch = pytest.importorskip("torch")
    from flax import linen as fnn

    dim, depth, n = 8, 3, 5
    x = rng.normal(size=(n, depth, dim)).astype(np.float32)  # (batch, seq, dim)

    lstm1 = fnn.RNN(fnn.OptimizedLSTMCell(dim), name="jknet")
    lstm2 = fnn.RNN(fnn.OptimizedLSTMCell(dim), name="jknet2")
    v1 = lstm1.init(jax.random.PRNGKey(0), jnp.asarray(x))
    h1 = lstm1.apply(v1, jnp.asarray(x))
    v2 = lstm2.init(jax.random.PRNGKey(1), h1)
    h2 = lstm2.apply(v2, h1)

    tl = torch.nn.LSTM(dim, dim, num_layers=2, batch_first=True)
    with torch.no_grad():
        for layer, v in ((0, v1), (1, v2)):
            c = v["params"]["cell"]
            w_ih = np.concatenate(
                [np.asarray(c[k]["kernel"]).T for k in ("ii", "if", "ig", "io")], 0
            )
            w_hh = np.concatenate(
                [np.asarray(c[k]["kernel"]).T for k in ("hi", "hf", "hg", "ho")], 0
            )
            b_hh = np.concatenate(
                [np.asarray(c[k]["bias"]) for k in ("hi", "hf", "hg", "ho")], 0
            )
            getattr(tl, f"weight_ih_l{layer}").copy_(torch.tensor(w_ih))
            getattr(tl, f"weight_hh_l{layer}").copy_(torch.tensor(w_hh))
            getattr(tl, f"bias_ih_l{layer}").zero_()
            getattr(tl, f"bias_hh_l{layer}").copy_(torch.tensor(b_hh))
        want, _ = tl(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(h2), want.numpy(), rtol=1e-5, atol=1e-5)


def test_sr_predict_end_to_end(rng):
    """Super-resolution prediction (HisToGene SR mode, reference
    predict.py:46-68): dense 56-px grid over the spot bbox, patches cut from
    the slide, model predicts expression at every unseen grid position."""
    from mclstexp_tpu.data.section import Section

    g, p = 6, 16
    slide = (rng.uniform(size=(400, 400, 3)) * 255).astype(np.uint8)
    centers = np.stack(np.meshgrid(np.arange(60, 380, 80),
                                   np.arange(60, 380, 80)), -1).reshape(-1, 2)
    n = len(centers)
    section = Section(
        name="S1",
        expression=rng.normal(size=(n, g)).astype(np.float32),
        positions=np.clip(centers // 8, 0, 63).astype(np.int32),
        centers=centers.astype(np.int32),
        patches=np.zeros((n, p, p, 3), np.uint8),
    )
    cfg = BaselineConfig(model="histogene", n_genes=g, patch_size=p, bucket=32,
                         max_epochs=1, lr=1e-4)
    model, state = init_baseline(cfg, section)
    preds, grid_centers = super_resolution.sr_predict(
        model, state, section, slide, cfg
    )
    assert preds.shape == (len(grid_centers), g)
    assert np.isfinite(preds).all()
    assert len(grid_centers) > n  # denser than the real spots
