"""Pin bench.py's timeout-resilience contract (VERDICT r4 missing #1).

The round-3 and round-4 driver bench records both failed to attest the
train-step headline (r3: one contended window; r4: killed at the driver
timeout with the single end-of-main JSON unprinted). Round 5 made the
emission INCREMENTAL — the headline JSON line is printed+flushed the moment
the train windows finish, and the final line carries a ``skipped`` list of
budget-elided secondary metrics instead of dying. These tests run the real
``bench.py`` as a subprocess in SMOKE mode (tiny shapes, tiny densenet, CPU
backend — harness validation, not a measurement) and assert the contract
the driver relies on:

  * >= 2 JSON lines on stdout, so an external kill after the train windows
    can no longer erase the headline;
  * the FIRST line already contains ``train_ms_per_step``, ``vs_baseline``
    and the tunnel probe;
  * a starved wall-clock budget (MCLSTEXP_BENCH_BUDGET_S=1) skips every
    secondary metric into ``skipped`` rather than crashing, and the final
    line still parses.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(extra_env, timeout):
    env = {
        **os.environ,
        "MCLSTEXP_BENCH_SMOKE": "1",
        "JAX_PLATFORMS": "cpu",
        **extra_env,
    }
    proc = subprocess.run(
        [sys.executable, BENCH],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,  # the hard alarm: a hang here is the r4 failure mode
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [json.loads(l) for l in proc.stdout.splitlines() if l.strip()]
    return lines


HEADLINE_KEYS = {
    "metric", "value", "vs_baseline", "ref_baseline_spots_per_sec",
    "train_ms_per_step", "tunnel_put_mb_per_s", "tunnel_get_mb_per_s",
    # device-health probe (r5): a slow TPU grant must be self-evident in
    # the record — see bench.probe_device
    "device_kind", "hbm_gbps_probe",
}


def test_bench_starved_budget_emits_headline_and_skips():
    """MCLSTEXP_BENCH_BUDGET_S=1: the headline must be attested and every
    secondary metric budget-skipped, not crashed (driver-timeout proof)."""
    lines = _run_bench({"MCLSTEXP_BENCH_BUDGET_S": "1"}, timeout=120)
    assert len(lines) >= 3
    # line 0: the pre-device-contact stage line (guarantees a parseable
    # record even if the tunnel wedges before the first measurement)
    assert lines[0]["partial"] is True and lines[0]["value"] is None
    assert lines[0]["stage"] == "started-before-device-contact"
    first = next(l for l in lines if l.get("value") is not None)
    last = lines[-1]
    assert HEADLINE_KEYS <= set(first), sorted(HEADLINE_KEYS - set(first))
    assert first["partial"] is True
    assert first["train_ms_per_step"]["n_windows"] >= 3
    # the final record supersedes: same headline, plus the skip accounting
    assert HEADLINE_KEYS <= set(last)
    assert "partial" not in last
    assert set(last["skipped"]) == {
        "visium_train", "eval_path", "streaming_retrieval", "fold_eval",
        "slide_attention",
    }
    assert last["train_ms_per_step"] == first["train_ms_per_step"]


@pytest.mark.slow
def test_bench_full_smoke_schema():
    """Unstarved smoke run: every metric executes, nothing is skipped, and
    the final line carries the full schema the round-over-round tracking
    reads (BENCH_r*.json)."""
    lines = _run_bench({}, timeout=300)
    assert len(lines) >= 4  # stage line + >=2 partials + final
    last = lines[-1]
    assert last["skipped"] == []
    for key in (
        "visium_train_ms_per_step", "eval_spots_per_sec",
        "eval_device_spots_per_sec", "retrieval_device_queries_per_sec",
        "retrieval_queries_per_sec", "streaming_retrieval_queries_per_sec",
        "streaming_retrieval_bf16_queries_per_sec", "fold_eval_host_ms",
        "fold_eval_resident_ms", "fold_eval_device_ms", "slide_attn_xla_ms",
        "elapsed_s",
    ):
        assert key in last, key
    # window stats are well-formed (median within [min, max], n recorded)
    for key in ("train_ms_per_step", "visium_train_ms_per_step"):
        st = last[key]
        assert st["min"] <= st["median"] <= st["max"]
        assert st["n_windows"] >= 3
