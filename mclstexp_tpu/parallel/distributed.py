"""Multi-host initialization.

The reference's only multi-process story is SLURM-derived torch DDP ranks in
the BLEEP baseline (reference ``baselines/Bleep/BLEEP_main.py:112-124``:
TCP rendezvous + NCCL). The TPU-native equivalent is ``jax.distributed`` —
one process per host, coordinator discovery from the TPU environment (or
explicit args), after which ``jax.devices()`` spans the slice and every
`Mesh` built on it lays collectives over ICI (DCN only across slices).
"""

from __future__ import annotations

import os
from typing import Optional


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-host; no-op otherwise.

    Returns True if distributed mode is active. Safe to call unconditionally
    at CLI entry: single-host runs (including the CPU test mesh) skip it.
    """
    import jax

    explicit = coordinator_address is not None or num_processes is not None
    env_present = any(
        os.environ.get(k)
        for k in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not explicit and not env_present:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def process_shard(n_items: int) -> slice:
    """This host's contiguous shard of a global work list (e.g. sections to
    pre-cut into patch caches) — the data-loading split the reference gets
    from DistributedSampler (``BLEEP_main.py:57``)."""
    import jax

    pc, pi = jax.process_count(), jax.process_index()
    per = (n_items + pc - 1) // pc
    return slice(pi * per, min((pi + 1) * per, n_items))


def sync_hosts(tag: str = "sync") -> None:
    """Barrier across hosts (no-op single-process). Used after the
    per-host patch-cache pre-cut so no host reads a half-written cache."""
    import jax

    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)
