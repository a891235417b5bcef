"""Benchmark: flagship contrastive train-step throughput on one TPU chip.

Measures end-to-end training throughput (patches+spots/sec) of the flagship
protocol — DenseNet121 image tower + 2-block spot transformer, batch 128,
224x224 patches, on-device augmentation fused into the jitted step — the
exact per-step work of reference ``train.py:30-42``.

Baseline: the reference publishes no throughput numbers (BASELINE.md), and
no reference GPU exists in this environment, so the denominator is MEASURED
from the part of the reference stack that runs on the host and provably
bounds its throughput: the single-process torch-DataLoader input pipeline
(num_workers unset, reference train.py:49 — per-item PIL crop + ColorJitter
+ flip + rotation + ToTensor, dataset.py:201-233, reproduced op-for-op in
tools/bench_reference_input.py). With the loader in-process the GPU idles
during all of it, so measured items/sec is an UPPER bound on reference
training throughput — its GPU forward/backward only adds serial time —
making vs_baseline a CONSERVATIVE speedup (the true ratio is higher).
Measured fresh at each bench run on the same host (falls back to the round-2
engineering estimate of 100 if PIL is unavailable). BENCH_*.json history
tracks round-over-round improvement on identical hardware.

Prints exactly one JSON line on stdout.
"""

import json
import sys
import time

import numpy as np

REF_SPOTS_PER_SEC_FALLBACK = 100.0  # rounds 1-2 engineering estimate


def measure_ref_baseline() -> tuple:
    """(spots/sec, provenance string) for the vs_baseline denominator."""
    try:
        from tools.bench_reference_input import measure_reference_items_per_sec

        ips = measure_reference_items_per_sec(n_items=300)
        return ips, "measured_input_pipeline_upper_bound"
    except Exception as e:  # pragma: no cover
        print(f"reference input-pipeline measurement failed: {e}", file=sys.stderr)
        return REF_SPOTS_PER_SEC_FALLBACK, "engineering_estimate"

BATCH = 128
IMAGE = 224
SPOT_DIM = 785
WARMUP = 3
STEPS = 20


def main():
    import os

    import jax

    # Persistent compilation cache: remote-tunnel compiles of this program
    # vary 60-500s run-to-run; a warm cache makes repeat benches immediate.
    cache_dir = os.environ.get("MCLSTEXP_JAX_CACHE", "/root/repo/.jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception as e:  # cache is best-effort
        print(f"compilation cache unavailable: {e}", file=sys.stderr)

    from mclstexp_tpu.config import Config, DataConfig, EvalConfig, ModelConfig, TrainConfig
    from mclstexp_tpu.train.state import create_train_state
    from mclstexp_tpu.train.step import make_train_step

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    dense_impl = os.environ.get("MCLSTEXP_BENCH_DENSE_IMPL", "piecewise8")
    if dense_impl != "piecewise8":
        print(f"dense_block_impl={dense_impl}", file=sys.stderr)
    # The flagship her2st protocol: its preset keeps only the reachable
    # 1024-row prefix of the positional tables (config.py PRESETS note —
    # bit-identical behavior, ~9.6 ms/step less optimizer/layout traffic
    # than the reference's 65536-row tables). Override to A/B:
    #   MCLSTEXP_BENCH_POS_VOCAB=65536 python bench.py
    pos_vocab = int(os.environ.get("MCLSTEXP_BENCH_POS_VOCAB", "1024"))
    cfg = Config(
        model=ModelConfig(
            encoder_name="densenet121", image_dim=1024, spot_dim=SPOT_DIM,
            dtype="bfloat16", dense_block_impl=dense_impl, pos_vocab=pos_vocab,
        ),
        train=TrainConfig(batch_size=BATCH),
        eval=EvalConfig(),
        data=DataConfig(),
    )

    rng = np.random.default_rng(0)
    host_batch = {
        "image_u8": rng.integers(0, 255, size=(BATCH, IMAGE, IMAGE, 3), dtype=np.uint8),
        "expression": rng.normal(size=(BATCH, SPOT_DIM)).astype(np.float32),
        "position": rng.integers(0, 64, size=(BATCH, 2)).astype(np.int32),
    }
    # Param shapes don't depend on batch size: init with a single sample.
    sample = {
        "image": host_batch["image_u8"][:1].astype(np.float32) / 255.0,
        "expression": host_batch["expression"][:1],
        "position": host_batch["position"][:1],
    }

    # create_train_state runs one jitted on-device init program (unjitted
    # init and host-init-then-transfer are both pathological over the
    # remote-TPU tunnel; see train/state.py).
    t0 = time.perf_counter()
    model, state = create_train_state(cfg.model, cfg.train, sample)
    print(f"init+transfer: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    step_fn = make_train_step(model, augment_mode="st", donate=True)
    device_batch = {k: jax.device_put(v) for k, v in host_batch.items()}
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    state, loss = step_fn(state, device_batch, jax.random.fold_in(key, 0))
    loss.block_until_ready()
    print(f"compile: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    for i in range(1, WARMUP):
        state, loss = step_fn(state, device_batch, jax.random.fold_in(key, i))
    float(loss)  # drain the device queue before the timed region starts
    print(f"warmup: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    for i in range(STEPS):
        state, loss = step_fn(state, device_batch, jax.random.fold_in(key, 100 + i))
    # Time to the final loss VALUE on the host, not block_until_ready():
    # on the remote transport block_until_ready can resolve before device
    # completion (measured: 20 chained DenseNet steps "completing" in 130 ms
    # vs 1.47 s to the actual value — PROFILE_r02.md). The readback is a true
    # data dependency on the whole chain.
    final_loss = float(loss)
    dt = time.perf_counter() - t0

    spots_per_sec = BATCH * STEPS / dt
    print(
        f"steps: {STEPS} x B={BATCH} in {dt:.3f}s "
        f"({dt / STEPS * 1000:.1f} ms/step, loss={final_loss:.4f})",
        file=sys.stderr,
    )

    eval_spots_per_sec, retrieval_qps = bench_eval_path(jax, model, state)
    streaming = bench_streaming_retrieval(jax)
    fold_eval = bench_fold_eval(jax)
    slide_attn = bench_slide_attention(jax)

    ref_sps, ref_provenance = measure_ref_baseline()
    print(
        f"reference baseline: {ref_sps:.1f} spots/s ({ref_provenance})",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "train_spots_per_sec",
                "value": round(spots_per_sec, 2),
                "unit": "patches+spots/sec/chip",
                "vs_baseline": round(spots_per_sec / ref_sps, 2),
                "ref_baseline_spots_per_sec": round(ref_sps, 2),
                "ref_baseline_provenance": ref_provenance,
                "eval_spots_per_sec": round(eval_spots_per_sec, 2),
                "retrieval_queries_per_sec": round(retrieval_qps, 2),
                **streaming,
                **fold_eval,
                **slide_attn,
            }
        )
    )


def bench_streaming_retrieval(jax, n_query=3456, n_keys=200_000, p=256,
                              g=SPOT_DIM, top_k=200):
    """Production-scale retrieval: Nq x Nk past STREAMING_SCORE_ELEMENTS, so
    `retrieve_and_aggregate` auto-switches to the memory-bounded
    `streaming_topk` scan (VERDICT r2 #5 — the "millions of reference spots
    resident in HBM" serving path). 200k keys ~= 15x the full HER2ST key set;
    the dense (Nq, Nk) score matrix would be 2.8 GB fp32 per query set."""
    import jax.numpy as jnp

    from mclstexp_tpu.ops.retrieval import (
        STREAMING_SCORE_ELEMENTS, retrieve_and_aggregate,
    )

    assert n_query * n_keys > STREAMING_SCORE_ELEMENTS  # auto-path engages
    kk, kg, kq = jax.random.split(jax.random.PRNGKey(3), 3)
    key_emb = jax.random.normal(kk, (n_keys, p), jnp.float32)
    key_expr = jax.random.normal(kg, (n_keys, g), jnp.float32)
    query = jax.random.normal(kq, (n_query, p), jnp.float32)
    jax.block_until_ready((key_emb, key_expr, query))

    t0 = time.perf_counter()
    retrieve_and_aggregate(key_emb, key_expr, query, top_k=top_k, weight_ord=1)
    print(f"streaming retrieval compile+run: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    t0 = time.perf_counter()
    # retrieve_and_aggregate returns host ndarrays — a true value readback.
    retrieve_and_aggregate(key_emb, key_expr, query, top_k=top_k, weight_ord=1)
    dt = time.perf_counter() - t0
    qps = n_query / dt
    print(
        f"streaming retrieval: {n_query} queries x {n_keys} keys (K={top_k}) "
        f"in {dt:.3f}s ({qps:.0f} queries/s)",
        file=sys.stderr,
    )
    return {
        "streaming_retrieval_queries_per_sec": round(qps, 2),
        "streaming_retrieval_n_keys": n_keys,
    }


def bench_fold_eval(jax, n_sections=32, spots=420, p=256, g=SPOT_DIM, top_k=200,
                    folds=3):
    """Per-fold LOO scoring cost, host-concat path vs device-resident masked
    path (VERDICT r2 #8 / weak #5). The host path re-concatenates 31
    sections' embeddings+expressions and re-uploads ~40 MB per fold over the
    tunnel; the resident path keeps one device key set and ships a bool mask.
    Measures `folds` folds of each at her2st scale and reports ms/fold."""
    import numpy as np

    from mclstexp_tpu.infer import evaluate

    rng = np.random.default_rng(4)
    sizes = [spots] * n_sections
    spot_embs = [rng.normal(size=(s, p)).astype(np.float32) for s in sizes]
    img_embs = [rng.normal(size=(s, p)).astype(np.float32) for s in sizes]
    exprs = [rng.normal(size=(s, g)).astype(np.float32) for s in sizes]

    # warm the compile (uniform sizes -> every fold reuses one executable)
    evaluate.evaluate_fold(0, img_embs[0], spot_embs, exprs,
                           top_k=top_k, weight_ord=1)
    t0 = time.perf_counter()
    for fold in range(1, folds + 1):
        evaluate.evaluate_fold(fold, img_embs[fold], spot_embs, exprs,
                               top_k=top_k, weight_ord=1)
    host_ms = (time.perf_counter() - t0) / folds * 1000

    bounds = evaluate.section_bounds(sizes)
    import jax.numpy as jnp

    spot_full = jnp.asarray(np.concatenate(spot_embs))
    img_full = jnp.asarray(np.concatenate(img_embs))
    expr_full = jnp.asarray(np.concatenate(exprs))
    jax.block_until_ready((spot_full, img_full, expr_full))
    # first fold compiles; time the rest
    evaluate.evaluate_fold_resident(0, img_full, spot_full, expr_full, bounds,
                                    exprs[0], top_k=top_k, weight_ord=1)
    t0 = time.perf_counter()
    for fold in range(1, folds + 1):
        evaluate.evaluate_fold_resident(fold, img_full, spot_full, expr_full,
                                        bounds, exprs[fold], top_k=top_k,
                                        weight_ord=1)
    resident_ms = (time.perf_counter() - t0) / folds * 1000
    print(
        f"fold eval ({n_sections}x{spots} spots, K={top_k}): host-concat "
        f"{host_ms:.0f} ms/fold vs device-resident {resident_ms:.0f} ms/fold",
        file=sys.stderr,
    )
    return {
        "fold_eval_host_ms": round(host_ms, 1),
        "fold_eval_resident_ms": round(resident_ms, 1),
    }


def bench_slide_attention(jax, n=4096, dim=1024, heads=16, dim_head=64,
                          iters=10):
    """Whole-slide attention fwd+bwd at HisToGene scale (reference
    ``vis_model.py:160-167`` runs O(N^2) attention over up to ~4,900 spots):
    dense-XLA vs the Pallas TPU flash kernel (``core/layers.py`` backend
    "flash"). Chained through a data dependency and timed to a host value
    readback (PROFILE_r02.md methodology)."""
    import jax.numpy as jnp

    from mclstexp_tpu.core.layers import MultiHeadSelfAttention

    x0 = jax.random.normal(jax.random.PRNGKey(2), (1, n, dim), jnp.bfloat16)
    out = {}
    for backend in ("xla", "flash"):
        m = MultiHeadSelfAttention(dim=dim, heads=heads, dim_head=dim_head,
                                   dtype=jnp.bfloat16, backend=backend)

        def loss(p, xx):
            return jnp.sum(jnp.square(m.apply(p, xx).astype(jnp.float32)))

        @jax.jit
        def step(p, xx, x_base):
            gx = jax.grad(loss, argnums=1)(p, xx)
            return x_base + jnp.asarray(0.0, jnp.bfloat16) * gx  # chained

        try:
            params = m.init(jax.random.PRNGKey(0), x0)
            xx = step(params, x0, x0)
            float(jnp.asarray(xx).ravel()[0])
            t0 = time.perf_counter()
            for _ in range(iters):
                xx = step(params, xx, x0)
            float(jnp.asarray(xx).ravel()[0])
            ms = (time.perf_counter() - t0) / iters * 1000
            out[f"slide_attn_{backend}_ms"] = round(ms, 2)
            print(f"slide attention ({backend}): N={n} fwd+bwd {ms:.2f} ms",
                  file=sys.stderr)
        except Exception as e:  # flash needs a real TPU
            print(f"slide attention ({backend}) unavailable: {e}",
                  file=sys.stderr)
    return out


def bench_eval_path(
    jax, model, state,
    n_eval=3456,   # ~10 HER2ST sections' worth of spots; 108 B=32 batches
    n_keys=9984,   # full 31-section key set scale (evel_her2st.py:152-156)
    top_k=200,
    image=IMAGE,
    spot_dim=SPOT_DIM,
):
    """Time the inference path: the B=32 batch-as-sequence embedding sweep
    (one lax.scan program, reference phase A ``evel_her2st.py:30-71``) and
    the fused top-K retrieval + 1/d^2 aggregation (reference phase B's hot
    loop, ``evel_her2st.py:174-187``). All inputs are generated on-device —
    a host->TPU transfer of this much data over the tunnel would dominate."""
    import jax.numpy as jnp

    from mclstexp_tpu.infer import embed
    from mclstexp_tpu.ops.retrieval import retrieve_and_aggregate

    N_EVAL, N_KEYS, TOP_K = n_eval, n_keys, top_k

    kp, ke, kx, kk, kg = jax.random.split(jax.random.PRNGKey(1), 5)
    prepared = {
        "n": N_EVAL,
        "patches": jax.random.bits(kp, (N_EVAL, image, image, 3), jnp.uint8),
        "expression": jax.random.normal(ke, (N_EVAL, spot_dim), jnp.float32),
        "positions": jax.random.randint(kx, (N_EVAL, 2), 0, 64, jnp.int32),
    }
    jax.block_until_ready(prepared["patches"])

    def sweep_once():
        return embed.compute_embeddings(
            model, state.params, state.batch_stats, sections=[],
            batch_size=32, prepared=prepared,
        )

    t0 = time.perf_counter()
    img, _ = sweep_once()
    print(f"eval sweep compile+run: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    img, _ = sweep_once()
    dt_sweep = time.perf_counter() - t0
    eval_spots_per_sec = N_EVAL / dt_sweep
    print(
        f"eval sweep: {N_EVAL} spots x 2 towers in {dt_sweep:.3f}s "
        f"({eval_spots_per_sec:.0f} spots/s)",
        file=sys.stderr,
    )

    key_emb = jax.random.normal(kk, (N_KEYS, img.shape[1]), jnp.float32)
    key_expr = jax.random.normal(kg, (N_KEYS, spot_dim), jnp.float32)
    jax.block_until_ready((key_emb, key_expr))

    t0 = time.perf_counter()
    retrieve_and_aggregate(key_emb, key_expr, img, top_k=TOP_K, weight_ord=1)
    print(f"retrieval compile+run: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    retrieve_and_aggregate(key_emb, key_expr, img, top_k=TOP_K, weight_ord=1)
    dt_ret = time.perf_counter() - t0
    retrieval_qps = N_EVAL / dt_ret
    print(
        f"retrieval: {N_EVAL} queries x {N_KEYS} keys (K={TOP_K}) in "
        f"{dt_ret:.3f}s ({retrieval_qps:.0f} queries/s)",
        file=sys.stderr,
    )
    return eval_spots_per_sec, retrieval_qps


if __name__ == "__main__":
    main()
