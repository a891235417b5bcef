"""Torch-checkpoint importer tests.

Two layers of coverage:
  * numeric goldens for the contrastive core (spot tower + projection heads
    + positional tables): a functional torch evaluation of the reference
    architecture on the same weights must match our flax apply;
  * structural roundtrip for the CNN towers: a synthetically-named torch
    state dict must convert into exactly the tree the flax model expects.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mclstexp_tpu.config import ModelConfig
from mclstexp_tpu.models.image.torch_import import import_reference_state_dict
from mclstexp_tpu.models.mclstexp import MclSTExp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _t(rng, *shape):
    return torch.tensor(rng.normal(size=shape).astype(np.float32) * 0.1)


def _make_reference_sd(rng, spot_dim, proj_dim, heads, dim_head, layers, vocab=64):
    """A state dict with the reference's key names for the non-CNN parts."""
    inner = heads * dim_head
    sd = {}
    sd["x_embed.weight"] = _t(rng, vocab, spot_dim)
    sd["y_embed.weight"] = _t(rng, vocab, spot_dim)
    for i in range(layers):
        p = f"spot_encoder.{i}"
        sd[f"{p}.attn.norm.weight"] = _t(rng, spot_dim) + 1.0
        sd[f"{p}.attn.norm.bias"] = _t(rng, spot_dim)
        sd[f"{p}.attn.fn.to_qkv.weight"] = _t(rng, inner * 3, spot_dim)
        sd[f"{p}.attn.fn.to_out.0.weight"] = _t(rng, spot_dim, inner)
        sd[f"{p}.attn.fn.to_out.0.bias"] = _t(rng, spot_dim)
        sd[f"{p}.ff.norm.weight"] = _t(rng, spot_dim) + 1.0
        sd[f"{p}.ff.norm.bias"] = _t(rng, spot_dim)
        sd[f"{p}.ff.fn.net.0.weight"] = _t(rng, spot_dim, spot_dim)
        sd[f"{p}.ff.fn.net.0.bias"] = _t(rng, spot_dim)
        sd[f"{p}.ff.fn.net.3.weight"] = _t(rng, spot_dim, spot_dim)
        sd[f"{p}.ff.fn.net.3.bias"] = _t(rng, spot_dim)
    for tower, in_dim in (("image_projection", 128), ("spot_projection", spot_dim)):
        sd[f"{tower}.projection.weight"] = _t(rng, proj_dim, in_dim)
        sd[f"{tower}.projection.bias"] = _t(rng, proj_dim)
        sd[f"{tower}.fc.weight"] = _t(rng, proj_dim, proj_dim)
        sd[f"{tower}.fc.bias"] = _t(rng, proj_dim)
        sd[f"{tower}.layer_norm.weight"] = _t(rng, proj_dim) + 1.0
        sd[f"{tower}.layer_norm.bias"] = _t(rng, proj_dim)
    return sd


def _torch_spot_tower(sd, expr, pos, layers, heads, dim_head):
    """Functional torch evaluation of the reference spot tower semantics
    (embedding add -> batch-as-sequence attention blocks -> projection)."""
    x_tab = sd["x_embed.weight"]
    y_tab = sd["y_embed.weight"]
    feats = expr + x_tab[pos[:, 0].long()] + y_tab[pos[:, 1].long()]
    x = feats.unsqueeze(0)
    for i in range(layers):
        p = f"spot_encoder.{i}"
        h = F.layer_norm(
            x, (x.shape[-1],), sd[f"{p}.attn.norm.weight"], sd[f"{p}.attn.norm.bias"]
        )
        qkv = F.linear(h, sd[f"{p}.attn.fn.to_qkv.weight"])
        b, n, _ = qkv.shape
        q, k, v = qkv.chunk(3, dim=-1)
        q = q.view(b, n, heads, dim_head).transpose(1, 2)
        k = k.view(b, n, heads, dim_head).transpose(1, 2)
        v = v.view(b, n, heads, dim_head).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-1, -2) * dim_head**-0.5, dim=-1)
        o = (attn @ v).transpose(1, 2).reshape(b, n, heads * dim_head)
        o = F.linear(o, sd[f"{p}.attn.fn.to_out.0.weight"], sd[f"{p}.attn.fn.to_out.0.bias"])
        x = x + o
        h = F.layer_norm(
            x, (x.shape[-1],), sd[f"{p}.ff.norm.weight"], sd[f"{p}.ff.norm.bias"]
        )
        h = F.linear(h, sd[f"{p}.ff.fn.net.0.weight"], sd[f"{p}.ff.fn.net.0.bias"])
        h = F.gelu(h)
        h = F.linear(h, sd[f"{p}.ff.fn.net.3.weight"], sd[f"{p}.ff.fn.net.3.bias"])
        x = x + h
    # spot projection head
    proj = F.linear(x, sd["spot_projection.projection.weight"], sd["spot_projection.projection.bias"])
    h = F.gelu(proj)
    h = F.linear(h, sd["spot_projection.fc.weight"], sd["spot_projection.fc.bias"])
    h = h + proj
    h = F.layer_norm(
        h, (h.shape[-1],), sd["spot_projection.layer_norm.weight"], sd["spot_projection.layer_norm.bias"]
    )
    return h.squeeze(0)


def test_spot_tower_import_matches_torch(rng):
    spot_dim, proj_dim, heads, dim_head, layers = 24, 8, 2, 6, 2
    sd = _make_reference_sd(rng, spot_dim, proj_dim, heads, dim_head, layers)
    sd_np = {k: v.numpy() for k, v in sd.items()}

    cfg = ModelConfig(
        encoder_name="tiny_cnn", image_dim=128, spot_dim=spot_dim,
        projection_dim=proj_dim, heads_num=heads, heads_dim=dim_head,
        head_layers=layers, pos_vocab=64,
    )

    # importer only handles CNN towers for the image side; graft the
    # converted spot-side params into a tiny_cnn-initialized model.
    import mclstexp_tpu.models.image.torch_import as ti

    b = ti._TreeBuilder()
    for i in range(layers):
        ti._import_attn_block(b, sd_np, f"spot_encoder.{i}", ("spot_encoder", f"block{i}"))
    b.set(b.params, ("spot_encoder", "pos", "x_embed"), sd_np["x_embed.weight"])
    b.set(b.params, ("spot_encoder", "pos", "y_embed"), sd_np["y_embed.weight"])
    ti._import_projection(b, sd_np, "spot_projection", "spot_projection")

    model = MclSTExp(cfg)
    batch = {
        "image": jnp.zeros((5, 16, 16, 3)),
        "expression": jnp.asarray(rng.normal(size=(5, spot_dim)).astype(np.float32)),
        "position": jnp.asarray(rng.integers(0, 64, size=(5, 2)).astype(np.int32)),
    }
    variables = model.init(jax.random.PRNGKey(0), batch)
    params = {**variables["params"], **b.params}
    ours = model.apply(
        {"params": params},
        batch["expression"],
        batch["position"],
        method=MclSTExp.encode_spots,
    )

    expected = _torch_spot_tower(
        sd,
        torch.tensor(np.asarray(batch["expression"])),
        torch.tensor(np.asarray(batch["position"])),
        layers, heads, dim_head,
    )
    np.testing.assert_allclose(np.asarray(ours), expected.numpy(), atol=2e-5)


def _make_densenet_sd(rng):
    """Synthesize a torchvision-named densenet121 features state dict."""
    sd = {}

    def conv(key, o, i, k):
        sd[key + ".weight"] = rng.normal(size=(o, i, k, k)).astype(np.float32) * 0.05

    def bn(key, c):
        sd[key + ".weight"] = np.ones(c, np.float32)
        sd[key + ".bias"] = np.zeros(c, np.float32)
        sd[key + ".running_mean"] = np.zeros(c, np.float32)
        sd[key + ".running_var"] = np.ones(c, np.float32)
        sd[key + ".num_batches_tracked"] = np.asarray(0)

    p = "image_encoder.model.0"
    conv(f"{p}.conv0", 64, 3, 7)
    bn(f"{p}.norm0", 64)
    feats = 64
    for bi, n_layers in enumerate((6, 12, 24, 16), start=1):
        for li in range(1, n_layers + 1):
            in_f = feats + (li - 1) * 32
            base = f"{p}.denseblock{bi}.denselayer{li}"
            bn(f"{base}.norm1", in_f)
            conv(f"{base}.conv1", 128, in_f, 1)
            bn(f"{base}.norm2", 128)
            conv(f"{base}.conv2", 32, 128, 3)
        feats += n_layers * 32
        if bi < 4:
            bn(f"{p}.transition{bi}.norm", feats)
            conv(f"{p}.transition{bi}.conv", feats // 2, feats, 1)
            feats //= 2
    bn(f"{p}.norm5", feats)
    return sd


def test_densenet_import_structure(rng):
    sd = _make_densenet_sd(rng)
    cfg = ModelConfig(encoder_name="densenet121", image_dim=1024, spot_dim=16,
                      projection_dim=8, heads_num=2, heads_dim=4, head_layers=1,
                      pos_vocab=64)
    # add the non-CNN parts so the full import runs
    rng2 = np.random.default_rng(1)
    extra = _make_reference_sd(rng2, 16, 8, 2, 4, 1, vocab=64)
    extra = {
        k: v.numpy()
        for k, v in extra.items()
        if not k.startswith("image_projection")
    }
    # reference image_projection input dim is 1024 for densenet
    for name, in_dim in (("image_projection", 1024),):
        extra[f"{name}.projection.weight"] = rng2.normal(size=(8, in_dim)).astype(np.float32)
        extra[f"{name}.projection.bias"] = np.zeros(8, np.float32)
        extra[f"{name}.fc.weight"] = rng2.normal(size=(8, 8)).astype(np.float32)
        extra[f"{name}.fc.bias"] = np.zeros(8, np.float32)
        extra[f"{name}.layer_norm.weight"] = np.ones(8, np.float32)
        extra[f"{name}.layer_norm.bias"] = np.zeros(8, np.float32)
    sd.update(extra)

    params, batch_stats = import_reference_state_dict(sd, cfg)

    model = MclSTExp(cfg)
    batch = {
        "image": jnp.zeros((1, 32, 32, 3)),
        "expression": jnp.zeros((1, 16)),
        "position": jnp.zeros((1, 2), jnp.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch)

    expect_shapes = jax.tree.map(lambda x: tuple(x.shape), variables["params"])
    got_shapes = jax.tree.map(lambda x: tuple(x.shape), params)
    assert expect_shapes == got_shapes
    bs_expect = jax.tree.map(lambda x: tuple(x.shape), variables.get("batch_stats", {}))
    bs_got = jax.tree.map(lambda x: tuple(x.shape), batch_stats)
    assert bs_expect == bs_got

    # the imported model must run
    out = model.apply({"params": params, "batch_stats": batch_stats}, batch)
    assert np.asarray(out[0]).shape == (1, 8)


def test_pos_vocab_prefix_is_exact(rng):
    """The ST presets keep only the reachable prefix of the reference's
    65536-row positional tables (config.py PRESETS note). Three properties:
    the importer slices reference tables to cfg.pos_vocab; a prefix model
    produces BIT-IDENTICAL spot encodings for in-range coords; and
    out-of-range coords fail loudly instead of silently clamping."""
    import mclstexp_tpu.models.image.torch_import as ti
    from mclstexp_tpu.train.loop import check_positions_in_vocab

    spot_dim, proj_dim, heads, dim_head, layers = 12, 8, 2, 4, 1
    full_vocab, prefix = 256, 32
    sd = _make_reference_sd(rng, spot_dim, proj_dim, heads, dim_head, layers,
                            vocab=full_vocab)
    sd_np = {k: v.numpy() for k, v in sd.items()}

    def build(vocab):
        cfg = ModelConfig(
            encoder_name="tiny_cnn", image_dim=128, spot_dim=spot_dim,
            projection_dim=proj_dim, heads_num=heads, heads_dim=dim_head,
            head_layers=layers, pos_vocab=vocab,
        )
        b = ti._TreeBuilder()
        for i in range(layers):
            ti._import_attn_block(b, sd_np, f"spot_encoder.{i}",
                                  ("spot_encoder", f"block{i}"))
        tab = lambda k: sd_np[k][:vocab]
        b.set(b.params, ("spot_encoder", "pos", "x_embed"), tab("x_embed.weight"))
        b.set(b.params, ("spot_encoder", "pos", "y_embed"), tab("y_embed.weight"))
        ti._import_projection(b, sd_np, "spot_projection", "spot_projection")
        return MclSTExp(cfg), b.params

    expr = jnp.asarray(rng.normal(size=(6, spot_dim)).astype(np.float32))
    pos = jnp.asarray(rng.integers(0, prefix, size=(6, 2)).astype(np.int32))

    outs = {}
    for vocab in (full_vocab, prefix):
        model, spot_params = build(vocab)
        batch = {"image": jnp.zeros((6, 16, 16, 3)), "expression": expr,
                 "position": pos}
        variables = model.init(jax.random.PRNGKey(0), batch)
        params = {**variables["params"], **spot_params}
        outs[vocab] = np.asarray(model.apply(
            {"params": params}, expr, pos, method=MclSTExp.encode_spots
        ))
    np.testing.assert_array_equal(outs[prefix], outs[full_vocab])

    # the full importer slices reference-sized tables to cfg.pos_vocab
    cfg_small = ModelConfig(
        encoder_name="tiny_cnn", image_dim=128, spot_dim=spot_dim,
        projection_dim=proj_dim, heads_num=heads, heads_dim=dim_head,
        head_layers=layers, pos_vocab=prefix,
    )
    b = ti._TreeBuilder()
    tab = b.take(sd_np, "x_embed.weight")
    sliced = tab[: cfg_small.pos_vocab] if cfg_small.pos_vocab < tab.shape[0] else tab
    assert sliced.shape == (prefix, spot_dim)

    # the loud out-of-range guard
    from mclstexp_tpu.data import synthetic

    sections = synthetic.make_dataset(num_sections=1, num_spots=8,
                                      num_genes=4, patch_size=8)
    bad = sections[0]
    bad.positions[0] = [prefix + 5, 0]
    with pytest.raises(ValueError, match="pos_vocab"):
        check_positions_in_vocab([bad], prefix)
    check_positions_in_vocab(sections, 64)  # in-range passes


def test_import_rejects_unconsumed(rng):
    cfg = ModelConfig(encoder_name="densenet121", image_dim=1024, spot_dim=16,
                      projection_dim=8, heads_num=2, heads_dim=4, head_layers=1,
                      pos_vocab=64)
    sd = _make_densenet_sd(rng)
    sd["surprise.weight"] = np.zeros(3, np.float32)
    with pytest.raises((ValueError, KeyError)):
        import_reference_state_dict(sd, cfg)
