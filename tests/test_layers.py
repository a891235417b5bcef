"""Unit goldens for core transformer layers against independent NumPy math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mclstexp_tpu.core import layers


def np_layernorm(x, scale, bias, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * scale + bias


def np_gelu(x):
    from scipy.special import erf

    return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))


def np_softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def test_dense_torch_init_bounds(rng):
    """Kernel/bias must follow torch defaults: U(+-1/sqrt(fan_in))."""
    mod = layers.DenseT(64)
    params = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 100)))["params"]
    k = np.asarray(params["kernel"])
    b = np.asarray(params["bias"])
    bound = 1.0 / np.sqrt(100)
    assert k.shape == (100, 64)
    assert np.abs(k).max() <= bound + 1e-7
    assert np.abs(b).max() <= bound + 1e-7
    # uniform, not clipped-normal: std should be near bound/sqrt(3)
    assert np.isclose(k.std(), bound / np.sqrt(3), rtol=0.1)


def test_layernorm_matches_numpy(rng):
    x = rng.normal(size=(4, 7, 16)).astype(np.float32)
    mod = layers.LayerNormT()
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = mod.apply(variables, jnp.asarray(x))
    scale = np.asarray(variables["params"]["scale"])
    bias = np.asarray(variables["params"]["bias"])
    np.testing.assert_allclose(np.asarray(out), np_layernorm(x, scale, bias), atol=1e-5)


def test_gelu_is_exact_erf(rng):
    x = rng.normal(size=(128,)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(layers.gelu_exact(jnp.asarray(x))), np_gelu(x), atol=1e-5
    )


def test_attention_matches_numpy(rng):
    """MHA forward vs a from-scratch NumPy computation of the same params."""
    dim, heads, dim_head, b, n = 32, 4, 8, 2, 10
    x = rng.normal(size=(b, n, dim)).astype(np.float32)
    mod = layers.MultiHeadSelfAttention(dim=dim, heads=heads, dim_head=dim_head)
    variables = mod.init(jax.random.PRNGKey(1), jnp.asarray(x))
    out = np.asarray(mod.apply(variables, jnp.asarray(x)))

    p = jax.tree.map(np.asarray, variables["params"])
    inner = heads * dim_head
    qkv = x @ p["to_qkv"]["kernel"]  # (b, n, 3*inner)
    qkv = qkv.reshape(b, n, 3, heads, dim_head)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    logits = np.einsum("bihd,bjhd->bhij", q, k) * dim_head**-0.5
    attn = np_softmax(logits)
    o = np.einsum("bhij,bjhd->bihd", attn, v).reshape(b, n, inner)
    expected = o @ p["to_out"]["kernel"] + p["to_out"]["bias"]
    np.testing.assert_allclose(out, expected, atol=2e-4)


def test_attn_block_residuals(rng):
    """Pre-LN residual wiring: zeroing the inner outputs must give identity."""
    dim = 16
    x = rng.normal(size=(1, 5, dim)).astype(np.float32)
    mod = layers.AttnBlock(dim=dim, heads=2, dim_head=8, mlp_dim=dim)
    variables = mod.init(jax.random.PRNGKey(2), jnp.asarray(x))

    # Zero the output projections of both sublayers -> block is identity.
    params = jax.tree.map(np.array, variables["params"])
    params["attn"]["to_out"]["kernel"][:] = 0
    params["attn"]["to_out"]["bias"][:] = 0
    params["ff"]["fc2"]["kernel"][:] = 0
    params["ff"]["fc2"]["bias"][:] = 0
    out = mod.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-6)


def test_projection_head_matches_numpy(rng):
    emb_dim, proj_dim = 24, 8
    x = rng.normal(size=(6, emb_dim)).astype(np.float32)
    mod = layers.ProjectionHead(projection_dim=proj_dim)
    variables = mod.init(jax.random.PRNGKey(3), jnp.asarray(x))
    out = np.asarray(mod.apply(variables, jnp.asarray(x)))

    p = jax.tree.map(np.asarray, variables["params"])
    projected = x @ p["projection"]["kernel"] + p["projection"]["bias"]
    h = np_gelu(projected)
    h = h @ p["fc"]["kernel"] + p["fc"]["bias"]
    h = h + projected
    expected = np_layernorm(h, p["layer_norm"]["scale"], p["layer_norm"]["bias"])
    np.testing.assert_allclose(out, expected, atol=1e-4)


def test_position_tables(rng):
    mod = layers.PositionTables(vocab=100, dim=12)
    pos = jnp.asarray([[3, 7], [0, 99]], dtype=jnp.float32)
    variables = mod.init(jax.random.PRNGKey(4), pos)
    out = np.asarray(mod.apply(variables, pos))
    xt = np.asarray(variables["params"]["x_embed"])
    yt = np.asarray(variables["params"]["y_embed"])
    np.testing.assert_allclose(out[0], xt[3] + yt[7], atol=1e-6)
    np.testing.assert_allclose(out[1], xt[0] + yt[99], atol=1e-6)
    # torch nn.Embedding init: N(0, 1)
    assert 0.9 < xt.std() < 1.1
