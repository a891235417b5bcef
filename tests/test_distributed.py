"""Multi-host smoke test: 2 real processes over jax.distributed on CPU.

The reference's only multi-process story is SLURM-launched DDP in BLEEP
(reference ``Bleep/BLEEP_main.py:112-124``); the TPU-native equivalent is
``jax.distributed``. This test actually launches two coordinator-connected
processes — the closest a single machine gets to exercising the multi-host
init, process_shard split, and the sync_hosts barrier for real.
"""

import os
import socket
import subprocess
import sys

import pytest


pytestmark = pytest.mark.slow

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
import jax
jax.config.update("jax_platforms", "cpu")  # env alone can be overridden by
# a site customization forcing an accelerator backend
from mclstexp_tpu.parallel.distributed import (
    maybe_initialize_distributed, process_shard, sync_hosts,
)
coord, pid = sys.argv[1], int(sys.argv[2])
ok = maybe_initialize_distributed(coord, 2, pid)
assert ok, "distributed init reported inactive"
assert jax.process_count() == 2
s = process_shard(5)
sync_hosts("smoke")
# a real cross-process collective: global sum over both processes' devices
from jax.experimental import multihost_utils
import numpy as np
total = multihost_utils.process_allgather(np.asarray([pid + 1.0]))
assert sorted(np.asarray(total).ravel().tolist()) == [1.0, 2.0]
print(f"SHARD {pid} {s.start} {s.stop}")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_smoke():
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coord, str(pid)],
            cwd=repo, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=150)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{err[-2000:]}"

    # the two shards of 5 items must tile [0, 5) without overlap
    shards = {}
    for _, out, _ in outs:
        for line in out.splitlines():
            if line.startswith("SHARD"):
                _, pid, start, stop = line.split()
                shards[int(pid)] = (int(start), int(stop))
    assert shards[0] == (0, 3) and shards[1] == (3, 5)
