"""Embedding dump: run every section through both towers of one checkpoint.

Reference phase A (``evel_her2st.py:30-71,87-117``): all sections are
concatenated, batched sequentially at B=32, and pushed through the image
tower and the spot tower — the spot tower sees *each batch as one sequence*,
so batch boundaries (including ones straddling two sections) are part of
the model's effective input. That batching is reproduced exactly; the
compute itself is a single jitted program per batch shape (two shapes: 32
and the final remainder).

Output layout matches the reference for drop-in compatibility:
``<out_dir>/img_embeddings_<i+1>.npy`` and ``spot_embeddings_<i+1>.npy``,
stored transposed (P, N_i) per section (``evel_her2st.py:109-117``).
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from mclstexp_tpu.data.pipeline import ConcatSections
from mclstexp_tpu.data.section import Section
from mclstexp_tpu.models.mclstexp import MclSTExp


# Dense-block impls measured FAST on the forward-only sweep (same chip,
# PROFILE_r03.md): concat 4,784-4,824 spots/s, piecewise8 4,816-4,930.
# Pure "piecewise" measured 3,104 (shallow K=32 contractions; without a
# backward pass the sweep is not HBM-pinned, so the MXU penalty shows) and
# "dus" is slow in every measurement — anything not on this list rebinds.
_EVAL_FAST_IMPLS = ("concat", "piecewise8")


def _eval_model(model: MclSTExp) -> MclSTExp:
    """Rebind slow-forward dense-block materializations to concat for the
    forward-only sweep.

    The shipping "piecewise8" passes through (measured at-or-above concat
    forward speed, and reusing the training model avoids compiling a second
    image-tower program per eval process). All impls share one param tree
    (disjoint channel slices), so the same params/batch_stats apply
    unchanged when a rebind does happen.
    """
    if model.config.dense_block_impl in _EVAL_FAST_IMPLS:
        return model
    import dataclasses

    return MclSTExp(dataclasses.replace(model.config, dense_block_impl="concat"))


def prepare_eval_arrays(sections: Sequence[Section], with_patches: bool = True):
    """Upload the concatenated eval arrays to HBM once.

    The LOO protocol embeds the SAME sections under every fold's checkpoint
    (reference ``evel_her2st.py:129-133``); preparing once saves a several-
    hundred-MB H2D transfer per fold. Returns an opaque handle for
    `compute_embeddings(prepared=...)`.

    with_patches=False skips the patch upload entirely (the dominant H2D
    byte count) for spot-tower-only consumers — e.g. the serving database
    (infer/serve.py), whose queries arrive over HTTP.

    "expression" is the MODEL-INPUT normalization (per-spot, train parity);
    "eval_expression" is the retrieval-key/ground-truth normalization the
    reference's phase B reads from the hvg scripts' matrices (per-gene —
    ``Section.eval_expression``). They alias the same device array when no
    section carries raw counts (visium, whose loaded matrices already ARE
    the per-gene files)."""
    import jax

    if not with_patches:
        prepared = {
            "n": sum(s.num_spots for s in sections),
            "patches": None,
            "expression": jax.device_put(
                np.concatenate([s.expression for s in sections], axis=0)
            ),
            "positions": jax.device_put(
                np.concatenate([s.positions for s in sections], axis=0)
            ),
        }
    else:
        data = ConcatSections.from_sections(sections)
        prepared = {
            "n": len(data),
            "patches": jax.device_put(np.ascontiguousarray(data.patches)),
            "expression": jax.device_put(data.expression),
            "positions": jax.device_put(data.positions),
        }
    if any(s.counts is not None for s in sections):
        prepared["eval_expression"] = jax.device_put(
            np.concatenate([s.eval_expression for s in sections], axis=0)
        )
    else:
        prepared["eval_expression"] = prepared["expression"]
    return prepared


def compute_embeddings(
    model: MclSTExp,
    params,
    batch_stats,
    sections: Sequence[Section],
    batch_size: int = 32,
    eval_augment: bool = False,
    seed: int = 0,
    prepared=None,
    raw_scale: bool = False,
    image_batch_size: Optional[int] = None,
    as_device: bool = False,
    tower: str = "both",
) -> Tuple[np.ndarray, np.ndarray]:
    """(image_embeddings, spot_embeddings), each (sum N_i, P), section order
    preserved. Batches of `batch_size` cross section boundaries (parity).

    eval_augment applies the Visium inference-time random flips/rotations
    quirk (seeded; reference ``dataset.py:316-325``); raw_scale keeps the
    raw 0-255 float input scale (reference ``dataset.py:336`` quirk).
    as_device=True returns jax device arrays (no D2H) — the LOO eval keeps
    embeddings + key sets HBM-resident across folds this way.
    tower="image"/"spot" runs only that sweep (the other return is None) —
    the serving database needs just the spot side and no patch upload."""
    import jax

    rng = jax.random.PRNGKey(seed)
    if prepared is None:
        prepared = prepare_eval_arrays(sections, with_patches=(tower != "spot"))
    n = prepared["n"]
    patches_dev = prepared["patches"]
    expr_dev = prepared["expression"]
    pos_dev = prepared["positions"]

    # Spot tower at exactly `batch_size` (each batch is one attention
    # sequence — parity-load-bearing). The image tower is per-spot
    # independent at eval, so it runs at a large batch for MXU utilization;
    # its outputs are bitwise independent of batching (BN in inference mode).
    #
    # The full sweep is ONE jitted lax.scan over batches (per-batch host
    # dispatches cost a transport round trip each); the remainder batch is
    # part of the same program. The jitted sweep is cached per (model,
    # eval_augment) so repeated dumps (the per-fold eval loop) don't
    # re-trace.
    sweep = _make_sweep(_eval_model(model), eval_augment, raw_scale)
    image_bs = image_batch_size or max(batch_size, 256)
    img = spot = None
    if tower in ("both", "image"):
        img = sweep(params, batch_stats, (patches_dev,), n, image_bs, "image", rng)
    if tower in ("both", "spot"):
        spot = sweep(params, batch_stats, (expr_dev, pos_dev), n, batch_size, "spot", rng)
    if as_device:
        return img, spot
    return (
        img if img is None else np.asarray(img),
        spot if spot is None else np.asarray(spot),
    )


@functools.lru_cache(maxsize=8)
def _make_sweep(model, eval_augment: bool, raw_scale: bool = False):
    import jax
    import jax.numpy as jnp

    def spot_encode(params, batch_stats, e, p):
        variables = {"params": params, "batch_stats": batch_stats}
        return model.apply(variables, e, p, method=type(model).encode_spots)

    def image_encode(params, batch_stats, u8, aug_rng):
        variables = {"params": params, "batch_stats": batch_stats}
        if eval_augment:
            from mclstexp_tpu.ops.augment import tenx_augment_inline

            images = tenx_augment_inline(aug_rng, u8, raw_scale=raw_scale)
        elif raw_scale:
            images = u8.astype(jnp.float32)
        else:
            images = u8.astype(jnp.float32) / 255.0
        return model.apply(variables, images, method=type(model).encode_image)

    @functools.partial(jax.jit, static_argnames=("n", "bs", "tower"))
    def sweep(params, batch_stats, arrays, n, bs, tower, rng):
        full = n - (n % bs)
        n_batches = full // bs

        def body(i, _):
            take = lambda a: jax.lax.dynamic_slice_in_dim(a, i * bs, bs, 0)
            if tower == "spot":
                out = spot_encode(params, batch_stats, take(arrays[0]), take(arrays[1]))
            else:
                out = image_encode(
                    params, batch_stats, take(arrays[0]), jax.random.fold_in(rng, i)
                )
            return i + 1, out

        if n_batches > 0:
            _, full_out = jax.lax.scan(body, 0, None, length=n_batches)
            full_out = full_out.reshape(full, -1)
        else:
            full_out = None
        if full == n:
            return full_out
        rem = lambda a: jax.lax.dynamic_slice_in_dim(a, full, n - full, 0)
        if tower == "spot":
            rem_out = spot_encode(params, batch_stats, rem(arrays[0]), rem(arrays[1]))
        else:
            rem_out = image_encode(
                params, batch_stats, rem(arrays[0]), jax.random.fold_in(rng, n_batches)
            )
        if full_out is None:
            return rem_out
        return jnp.concatenate([full_out, rem_out], axis=0)

    return sweep


@functools.lru_cache(maxsize=8)
def _make_sharded_sweep(model, raw_scale: bool, mesh, axis: str):
    """Compiled programs for the sharded sweep, cached per (model, mesh).

    params/batch_stats are THREADED AS ARGUMENTS (replicated ``P()`` specs),
    never closed over: closure device arrays become compile-request
    constants, and the flagship's 2x206 MB position tables alone exceed the
    remote-compile request limit on the TPU tunnel (HTTP 413, CLAUDE.md).
    Caching also keeps the 32-fold LOO eval from re-tracing per fold.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    def spot_encode(params, batch_stats, e, p):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, e, p,
            method=type(model).encode_spots,
        )

    def image_encode(params, batch_stats, u8):
        images = u8.astype(jnp.float32)
        if not raw_scale:
            images = images / 255.0
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, images,
            method=type(model).encode_image,
        )

    def img_local(params, batch_stats, pt):
        def body(_, b):
            return _, image_encode(params, batch_stats, b)

        _, out = jax.lax.scan(body, None, pt)
        return out

    def spot_local(params, batch_stats, ex, po):
        def body(_, b):
            return _, spot_encode(params, batch_stats, b[0], b[1])

        _, out = jax.lax.scan(body, None, (ex, po))
        return out

    rep, spec = P(), P(axis)
    img_sweep = jax.jit(jax.shard_map(
        img_local, mesh=mesh, in_specs=(rep, rep, spec), out_specs=spec,
        check_vma=False,
    ))
    spot_sweep = jax.jit(jax.shard_map(
        spot_local, mesh=mesh, in_specs=(rep, rep, spec, spec),
        out_specs=spec, check_vma=False,
    ))
    return {
        "image": (img_sweep, jax.jit(image_encode)),
        "spot": (spot_sweep, jax.jit(spot_encode)),
    }


def _run_sharded_tower(
    sweep, tail_fn, params, batch_stats, arrays, n: int, bs: int, n_dev: int
) -> np.ndarray:
    """Batch -> pad to a device multiple -> shard_map scan -> unsharded tail."""
    import jax.numpy as jnp

    full = n - n % bs
    nb = full // bs
    nb_pad = -(-nb // n_dev) * n_dev if nb else 0
    outs = []
    if nb_pad:
        def to_batches(a):
            ab = a[:full].reshape(nb, bs, *a.shape[1:])
            if nb_pad > nb:
                pad = jnp.zeros((nb_pad - nb, bs) + a.shape[1:], a.dtype)
                ab = jnp.concatenate([ab, pad], axis=0)
            return ab

        out = sweep(params, batch_stats, *[to_batches(a) for a in arrays])
        outs.append(np.asarray(out).reshape(nb_pad * bs, -1)[:full])
    if full < n:  # tail batch, unsharded (same shapes as the 1-device path)
        outs.append(np.asarray(tail_fn(params, batch_stats, *[a[full:] for a in arrays])))
    return outs[0] if len(outs) == 1 else np.concatenate(outs, axis=0)


def compute_embeddings_sharded(
    model: MclSTExp,
    params,
    batch_stats,
    sections: Sequence[Section],
    mesh,
    batch_size: int = 32,
    raw_scale: bool = False,
    prepared=None,
    axis: str = "data",
    image_batch_size: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Multi-chip embedding sweep: the protocol's B=32 batches distributed
    round-robin over the mesh's data axis via shard_map.

    Each spot batch is still EXACTLY one `batch_size` attention sequence in
    the original order (the batch-as-sequence protocol quirk, reference
    ``evel_her2st.py:24,67``), so per-batch outputs are identical to the
    single-device sweep — batches are merely executed on different chips.
    The image tower is per-spot independent at eval, so it runs at its own
    larger batch (same `max(batch_size, 256)` default as the unsharded
    path) for MXU utilization. Tail remainders run unsharded. Visium's
    eval-time-augmentation quirk is not supported here (its per-batch rng
    stream is defined by the single-device sweep; use `compute_embeddings`
    for visium parity).
    """
    if prepared is None:
        prepared = prepare_eval_arrays(sections)
    n = prepared["n"]
    n_dev = mesh.shape[axis]
    sweeps = _make_sharded_sweep(_eval_model(model), raw_scale, mesh, axis)
    image_bs = image_batch_size or max(batch_size, 256)
    img = _run_sharded_tower(
        *sweeps["image"], params, batch_stats, (prepared["patches"],),
        n, image_bs, n_dev,
    )
    spot = _run_sharded_tower(
        *sweeps["spot"], params, batch_stats,
        (prepared["expression"], prepared["positions"]), n, batch_size, n_dev,
    )
    return img, spot


def split_by_section(
    embeddings: np.ndarray, section_sizes: Sequence[int]
) -> List[np.ndarray]:
    out, start = [], 0
    for n in section_sizes:
        out.append(embeddings[start : start + n])
        start += n
    assert start == len(embeddings)
    return out


def save_embedding_files(
    img: np.ndarray, spot: np.ndarray, sizes: Sequence[int], out_dir: str
) -> None:
    """Write precomputed embeddings in the reference's per-section transposed
    .npy layout (``evel_her2st.py:109-117``)."""
    img, spot = np.asarray(img), np.asarray(spot)
    os.makedirs(out_dir, exist_ok=True)
    for i, (im, sp) in enumerate(
        zip(split_by_section(img, sizes), split_by_section(spot, sizes))
    ):
        np.save(os.path.join(out_dir, f"img_embeddings_{i + 1}.npy"), im.T)
        np.save(os.path.join(out_dir, f"spot_embeddings_{i + 1}.npy"), sp.T)


def dump_embeddings(
    model: MclSTExp,
    params,
    batch_stats,
    sections: Sequence[Section],
    out_dir: str,
    batch_size: int = 32,
    eval_augment: bool = False,
    raw_scale: bool = False,
) -> None:
    """Write the reference-compatible per-section transposed .npy files."""
    img, spot = compute_embeddings(
        model, params, batch_stats, sections, batch_size, eval_augment,
        raw_scale=raw_scale,
    )
    save_embedding_files(img, spot, [s.num_spots for s in sections], out_dir)
