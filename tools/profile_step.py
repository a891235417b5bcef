"""Attribute the flagship train step's time on the real TPU chip.

Times chained variants of the B=128 step (the bench.py program) to find
where the 77.7 ms/step (round 1) goes:

  full        augment + both towers + InfoNCE + Adam (the bench program)
  no_aug      same but images arrive as floats (augmentation excluded)
  img_fwd_bwd image tower + projection only, dummy loss, fwd+bwd+Adam
  img_fwd     image tower + projection forward only
  spot_only   spot tower + projection only, fwd+bwd+Adam
  aug_only    augmentation alone (jitter + flip + paeth rotation)

Also dumps XLA's cost analysis (flops / bytes accessed) for the full step,
giving the roofline position: flops/197e12 vs bytes/819e9 on v5e.

Run strictly alone on the TPU (see CLAUDE.md). Usage:
  python tools/profile_step.py [--steps 20]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--encoder", type=str, default="densenet121")
    ap.add_argument("--image", type=int, default=224)
    ap.add_argument("--spot-dim", type=int, default=785)
    ap.add_argument("--cpu", action="store_true", help="hermetic CPU smoke run")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize tower dense layers (ModelConfig.remat_tower)")
    ap.add_argument("--pos-vocab", type=int, default=1024,
                    help="positional-table rows (flagship ST preset 1024; "
                         "65536 = the reference-sized tables)")
    ap.add_argument("--only", type=str, default="",
                    help="comma-separated variants to run (full,no_aug,aug_only,"
                         "img_fwd_bwd,img_fwd,spot_only); each fresh variant is "
                         "a multi-minute tunnel compile, so run a few at a time")
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    cache_dir = os.environ.get("MCLSTEXP_JAX_CACHE", "/root/repo/.jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from mclstexp_tpu.config import ModelConfig, TrainConfig
    from mclstexp_tpu.ops import augment
    from mclstexp_tpu.train.state import create_train_state
    from mclstexp_tpu.train.step import make_train_step
    from mclstexp_tpu.core.losses import symmetric_infonce

    B, IMG, G = args.batch, args.image, args.spot_dim
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    from mclstexp_tpu.config import ENCODER_DIMS

    cfg_m = ModelConfig(encoder_name=args.encoder,
                        image_dim=ENCODER_DIMS[args.encoder], spot_dim=G,
                        dtype="bfloat16", remat_tower=args.remat,
                        pos_vocab=args.pos_vocab)
    cfg_t = TrainConfig(batch_size=B)

    rng = np.random.default_rng(0)
    host = {
        "image_u8": rng.integers(0, 255, size=(B, IMG, IMG, 3), dtype=np.uint8),
        "expression": rng.normal(size=(B, G)).astype(np.float32),
        "position": rng.integers(0, 64, size=(B, 2)).astype(np.int32),
    }
    sample = {
        "image": host["image_u8"][:1].astype(np.float32) / 255.0,
        "expression": host["expression"][:1],
        "position": host["position"][:1],
    }
    model, state = create_train_state(cfg_m, cfg_t, sample)
    batch = {k: jax.device_put(v) for k, v in host.items()}
    key = jax.random.PRNGKey(0)
    results = {}
    if args.out and os.path.exists(args.out):
        results.update(json.load(open(args.out)))  # accumulate across runs
    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    def flush():
        if args.out:
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)

    def _readback(out):
        # Host VALUE readback: on the remote transport block_until_ready can
        # resolve before the device finishes (PROFILE_r02.md) — only a data
        # readback is a true completion barrier.
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.asarray(leaf).ravel()[0])

    def timeit(name, fn, *fnargs, steps=args.steps):
        out = fn(*fnargs, jax.random.fold_in(key, 0))
        _readback(out)
        t0 = time.perf_counter()
        for i in range(steps):
            out = fn(*fnargs, jax.random.fold_in(key, i + 1))
        _readback(out)
        ms = (time.perf_counter() - t0) / steps * 1000
        results[name] = round(ms, 2)
        print(f"{name:14s} {ms:8.2f} ms/iter", file=sys.stderr, flush=True)
        flush()
        return out

    # ---- full step (stateful: thread state through the chain) -------------
    step_fn = make_train_step(model, augment_mode="st", donate=True)

    def run_full(state0, steps):  # noqa: E306
        s = state0
        s, loss = step_fn(s, batch, jax.random.fold_in(key, 0))
        float(loss)
        t0 = time.perf_counter()
        for i in range(steps):
            s, loss = step_fn(s, batch, jax.random.fold_in(key, i + 1))
        float(loss)  # value readback = true completion barrier
        return s, (time.perf_counter() - t0) / steps * 1000

    if want("full"):
        state, ms = run_full(state, args.steps)
        results["full"] = round(ms, 2)
        print(f"{'full':14s} {ms:8.2f} ms/iter", file=sys.stderr, flush=True)
        flush()
        _cost_analysis(jax, step_fn, state, batch, key, results)
        flush()

    # ---- no-aug step (state threaded -> chained) ---------------------------
    if want("no_aug"):
        step_noaug = make_train_step(model, augment_mode="none", donate=False)
        s = state
        s, loss = step_noaug(s, batch, jax.random.fold_in(key, 0))
        float(loss)
        t0 = time.perf_counter()
        for i in range(args.steps):
            s, loss = step_noaug(s, batch, jax.random.fold_in(key, i + 1))
        float(loss)  # value readback = true completion barrier
        ms = (time.perf_counter() - t0) / args.steps * 1000
        results["no_aug"] = round(ms, 2)
        print(f"{'no_aug':14s} {ms:8.2f} ms/iter", file=sys.stderr, flush=True)
        flush()
        del s

    # ---- augmentation alone ------------------------------------------------
    if want("aug_only"):
        @jax.jit
        def aug_only(r):
            return augment.train_augment_inline(
                r, batch["image_u8"], dtype=jnp.bfloat16, rot_impl="paeth"
            )

        timeit("aug_only", aug_only)

    # ---- image tower fwd+bwd (dummy scalar loss) ---------------------------
    images_f = jnp.asarray(host["image_u8"]).astype(jnp.bfloat16) / 255.0

    def img_loss(params, r):
        variables = {"params": params, "batch_stats": state.batch_stats}
        emb, _ = model.apply(variables, images_f, train=True,
                             mutable=["batch_stats"], rngs={"dropout": r},
                             method=type(model).encode_image)
        return jnp.sum(jnp.square(emb))

    # params passed as arguments, not closure constants: closed-over arrays
    # are shipped inside the remote-compile request (the 65536-entry pos
    # tables alone are 2 x 205 MB -> HTTP 413 on the compile endpoint).
    if want("img_fwd_bwd"):
        img_grad = jax.jit(jax.grad(img_loss))
        timeit("img_fwd_bwd", img_grad, state.params)

    if want("img_fwd"):
        img_fwd = jax.jit(img_loss)
        timeit("img_fwd", img_fwd, state.params)

    # ---- spot tower fwd+bwd -------------------------------------------------
    if want("spot_only"):
        expr = jnp.asarray(host["expression"])
        pos = jnp.asarray(host["position"])

        def spot_loss(params, r):
            variables = {"params": params, "batch_stats": state.batch_stats}
            emb = model.apply(variables, expr, pos, train=True,
                              rngs={"dropout": r}, method=type(model).encode_spots)
            return jnp.sum(jnp.square(emb))

        spot_grad = jax.jit(jax.grad(spot_loss))
        timeit("spot_only", spot_grad, state.params)

    print(json.dumps(results))
    flush()


def _cost_analysis(jax, step_fn, state, batch, key, results):
    # cost analysis of the compiled full step
    try:
        lowered = step_fn.lower(state, batch, key)
        ca = lowered.compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        bytes_acc = float(ca.get("bytes accessed", 0.0))
        results["cost_flops_T"] = round(flops / 1e12, 3)
        results["cost_bytes_GB"] = round(bytes_acc / 1e9, 3)
        # v5e: ~197 TF/s bf16, ~819 GB/s HBM
        results["roofline_compute_ms"] = round(flops / 197e12 * 1e3, 2)
        results["roofline_memory_ms"] = round(bytes_acc / 819e9 * 1e3, 2)
        print(f"cost: {flops/1e12:.2f} TF, {bytes_acc/1e9:.2f} GB  -> "
              f"compute floor {results['roofline_compute_ms']} ms, "
              f"memory floor {results['roofline_memory_ms']} ms", file=sys.stderr)
    except Exception as e:
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
