"""Per-op xprof attribution of the flagship train step on the real TPU.

Traces a few chained B=128 steps with ``jax.profiler.trace`` and converts
the captured xplane to the ``hlo_stats`` tool table (the methodology behind
PROFILE_r02/r03's category tables), then prints per-HLO-category self time
per step plus the bandwidth-weighted roofline position.

Run strictly alone on the TPU (CLAUDE.md). Usage:
  python tools/xprof_step.py [--steps 5] [--impl piecewise] [--out raw.json]
"""

import argparse
import glob
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--impl", type=str, default="piecewise8")  # shipping default
    ap.add_argument("--pos-vocab", type=int, default=1024)
    ap.add_argument("--spot-dim", type=int, default=785,
                    help="785 her2st (default) / 685 visium / 171 cscc")
    ap.add_argument("--pos-range", type=int, default=64,
                    help="coordinate draw range; set to pos_vocab to "
                         "exercise a remapped-dense visium table")
    ap.add_argument("--trace-dir", type=str, default="/tmp/xprof_step_trace")
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()

    import jax

    cache_dir = os.environ.get("MCLSTEXP_JAX_CACHE", "/root/repo/.jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from mclstexp_tpu.config import ENCODER_DIMS, ModelConfig, TrainConfig
    from mclstexp_tpu.train.state import create_train_state
    from mclstexp_tpu.train.step import make_train_step

    B, IMG, G = args.batch, 224, args.spot_dim
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    cfg_m = ModelConfig(
        encoder_name="densenet121", image_dim=ENCODER_DIMS["densenet121"],
        spot_dim=G, dtype="bfloat16", pos_vocab=args.pos_vocab,
        dense_block_impl=args.impl,
    )
    rng = np.random.default_rng(0)
    host = {
        "image_u8": rng.integers(0, 255, size=(B, IMG, IMG, 3), dtype=np.uint8),
        "expression": rng.normal(size=(B, G)).astype(np.float32),
        "position": rng.integers(0, args.pos_range, size=(B, 2)).astype(np.int32),
    }
    sample = {
        "image": host["image_u8"][:1].astype(np.float32) / 255.0,
        "expression": host["expression"][:1],
        "position": host["position"][:1],
    }
    model, state = create_train_state(cfg_m, TrainConfig(batch_size=B), sample)
    batch = {k: jax.device_put(v) for k, v in host.items()}
    key = jax.random.PRNGKey(0)
    step_fn = make_train_step(model, augment_mode="st", donate=True)

    # compile + warm
    state, loss = step_fn(state, batch, jax.random.fold_in(key, 0))
    float(loss)
    t0 = time.perf_counter()
    with jax.profiler.trace(args.trace_dir):
        for i in range(args.steps):
            state, loss = step_fn(state, batch, jax.random.fold_in(key, i + 1))
        final = float(loss)  # value readback inside the trace window
    wall_ms = (time.perf_counter() - t0) / args.steps * 1000
    print(f"traced {args.steps} steps: {wall_ms:.1f} ms/step wall "
          f"(loss={final:.4f})", file=sys.stderr)

    xplanes = glob.glob(os.path.join(args.trace_dir, "**", "*.xplane.pb"),
                        recursive=True)
    xplane = max(xplanes, key=os.path.getmtime)
    from xprof.convert import raw_to_tool_data

    raw, _ = raw_to_tool_data.xspace_to_tool_data([xplane], "hlo_stats", {})
    table = json.loads(raw) if isinstance(raw, (str, bytes)) else raw
    if args.out:
        with open(args.out, "w") as f:
            json.dump(table, f)

    cols = [c["id"] for c in table["cols"]]
    ci = {c: i for i, c in enumerate(cols)}
    cat_us, cat_bw = defaultdict(float), defaultdict(float)
    total_us = 0.0
    bw_weighted, bw_time = 0.0, 0.0
    bound_us = defaultdict(float)
    for row in table["rows"]:
        c = row["c"]
        cat = c[ci["category"]]["v"]
        self_us = float(c[ci["total_self_time"]]["v"])
        cat_us[cat] += self_us
        total_us += self_us
        bw = c[ci.get("measured_memory_bw", -1)]
        if bw is not None and "measured_memory_bw" in ci:
            try:
                bw_gbs = float(bw["v"])
                bw_weighted += bw_gbs * self_us
                bw_time += self_us
            except (TypeError, ValueError, KeyError):
                pass
        if "bound_by" in ci:
            try:
                bound_us[c[ci["bound_by"]]["v"]] += self_us
            except (TypeError, KeyError):
                pass

    per_step = {k: v / args.steps / 1000 for k, v in cat_us.items()}
    print(f"\ndevice busy: {total_us / args.steps / 1000:.1f} ms/step")
    for cat, ms in sorted(per_step.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:30s} {ms:7.2f} ms/step")
    if bw_time:
        print(f"\nself-time-weighted HBM bandwidth: {bw_weighted / bw_time:.0f} GB/s")
    if bound_us:
        for b, us in sorted(bound_us.items(), key=lambda kv: -kv[1]):
            print(f"  bound_by {b:12s} {us / args.steps / 1000:7.2f} ms/step")


if __name__ == "__main__":
    main()
