"""Benchmark: flagship contrastive train-step throughput on one TPU chip.

Measures end-to-end training throughput (patches+spots/sec) of the flagship
protocol — DenseNet121 image tower + 2-block spot transformer, batch 128,
224x224 patches, on-device augmentation fused into the jitted step — the
exact per-step work of reference ``train.py:30-42``.

Baseline: the reference publishes no throughput numbers (BASELINE.md). The
denominator below is an engineering estimate of the reference PyTorch
pipeline on its unspecified single GPU: DenseNet121 fwd+bwd at B=128 fp32 is
~9 GFLOPs/sample (compute-bound ceiling of a few hundred samples/s on a
V100-class card), but the reference's input path is a *single-process*
torch DataLoader (num_workers=0, train.py:49) doing per-item PIL crops from
full-resolution slides plus ColorJitter/rotation — ~10 ms/item serial with
the GPU idle, capping effective throughput around 100 spots/s. We use
REF_SPOTS_PER_SEC = 100 and report vs_baseline against it; BENCH_*.json
history tracks round-over-round improvement on identical hardware.

Prints exactly one JSON line on stdout.
"""

import json
import sys
import time

import numpy as np

REF_SPOTS_PER_SEC = 100.0

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

    cfg = Config(
        model=ModelConfig(
            encoder_name="densenet121", image_dim=1024, spot_dim=SPOT_DIM,
            dtype="bfloat16",
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
    slide_attn = bench_slide_attention(jax)

    print(
        json.dumps(
            {
                "metric": "train_spots_per_sec",
                "value": round(spots_per_sec, 2),
                "unit": "patches+spots/sec/chip",
                "vs_baseline": round(spots_per_sec / REF_SPOTS_PER_SEC, 2),
                "eval_spots_per_sec": round(eval_spots_per_sec, 2),
                "retrieval_queries_per_sec": round(retrieval_qps, 2),
                **slide_attn,
            }
        )
    )


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
