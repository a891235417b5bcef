"""Batching pipelines: host-side index shuffling, device-side everything else.

The reference's input path is the torch DataLoader re-cropping and
re-augmenting PIL images per item per epoch on the CPU (reference
``dataset.py:208-233``, ``train.py:49``). Here the host only shuffles
indices and slices pre-cut uint8 patch arrays; normalization and
augmentation run on the TPU inside the train step (ops.augment). This is
where most of the throughput win over the reference comes from.

Batch semantics preserved for parity:
  * training: global shuffle over the concatenation of the training
    sections, batch 128, final partial batch kept (torch DataLoader
    drop_last=False) — compiled as a second fixed shape;
  * eval: *sequential* batches of 32 over the concatenated sections —
    section boundaries fall mid-batch exactly as in the reference's
    ConcatDataset (evel_her2st.py:15-27), which matters because the spot
    tower treats each batch as one sequence.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Sequence

import numpy as np

from mclstexp_tpu.data.section import Section

Batch = Dict[str, np.ndarray]


@dataclasses.dataclass
class ConcatSections:
    """Concatenated per-field views over a list of sections."""

    patches: np.ndarray  # (N, P, P, 3) uint8
    expression: np.ndarray  # (N, G) float32
    positions: np.ndarray  # (N, 2) int32
    centers: np.ndarray  # (N, 2) int32
    section_sizes: List[int]
    section_names: List[str]

    @classmethod
    def from_sections(cls, sections: Sequence[Section]) -> "ConcatSections":
        assert all(s.patches is not None for s in sections), "sections need patches"
        return cls(
            patches=np.concatenate([np.asarray(s.patches) for s in sections], axis=0),
            expression=np.concatenate([s.expression for s in sections], axis=0),
            positions=np.concatenate([s.positions for s in sections], axis=0),
            centers=np.concatenate([s.centers for s in sections], axis=0),
            section_sizes=[s.num_spots for s in sections],
            section_names=[s.name for s in sections],
        )

    def __len__(self) -> int:
        return len(self.expression)

    def take(self, idx: np.ndarray) -> Batch:
        return {
            "image_u8": self.patches[idx],
            "expression": self.expression[idx],
            "position": self.positions[idx],
        }


def train_batches(
    data: ConcatSections,
    batch_size: int,
    seed: int,
    epoch: int,
    keep_remainder: bool = True,
) -> Iterator[Batch]:
    """One epoch of shuffled batches (uint8 patches; augmentation is on-device)."""
    n = len(data)
    rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
    order = rng.permutation(n)
    full = n - (n % batch_size)
    for start in range(0, full, batch_size):
        yield data.take(order[start : start + batch_size])
    if keep_remainder and full < n:
        yield data.take(order[full:])


def eval_batches(data: ConcatSections, batch_size: int) -> Iterator[Batch]:
    """Sequential batches over the concatenation (no shuffle, remainder kept)."""
    n = len(data)
    for start in range(0, n, batch_size):
        idx = np.arange(start, min(start + batch_size, n))
        yield data.take(idx)


class DeviceResidentData:
    """The training set resident in HBM; batches are on-device gathers.

    Streaming 128 x 224² uint8 patches per step costs ~19 MB of H2D per
    batch; at reference scale the whole training set is only ~0.2-2 GB, so
    it lives in HBM once and the host sends 128 int32 indices per step.
    Under a mesh the source arrays are replicated and the gathered batch is
    sharded on the data axis (GSPMD handles the scatter).
    """

    def __init__(self, data: ConcatSections, mesh=None):
        import jax
        import jax.numpy as jnp

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            put = lambda x: jax.device_put(x, rep)
        else:
            put = jax.device_put
        self._mesh = mesh
        self.n = len(data)
        self.patches = put(np.ascontiguousarray(data.patches))
        self.expression = put(data.expression)
        self.positions = put(data.positions)

        @jax.jit
        def gather(patches, expression, positions, idx):
            return {
                "image_u8": jnp.take(patches, idx, axis=0),
                "expression": jnp.take(expression, idx, axis=0),
                "position": jnp.take(positions, idx, axis=0),
            }

        self._gather = gather

    def nbytes(self) -> int:
        return (
            self.patches.nbytes + self.expression.nbytes + self.positions.nbytes
        )

    def take(self, idx: np.ndarray) -> Batch:
        import jax

        if self._mesh is not None:
            from mclstexp_tpu.parallel.mesh import batch_sharding, replicated

            n_shards = self._mesh.shape.get("data", 1)
            sharding = (
                batch_sharding(self._mesh)
                if len(idx) % n_shards == 0
                else replicated(self._mesh)
            )
            idx_dev = jax.device_put(np.asarray(idx, np.int32), sharding)
        else:
            idx_dev = jax.device_put(np.asarray(idx, np.int32))
        return self._gather(self.patches, self.expression, self.positions, idx_dev)


def device_train_batches(
    device_data: DeviceResidentData,
    batch_size: int,
    seed: int,
    epoch: int,
    keep_remainder: bool = True,
) -> Iterator[Batch]:
    """train_batches over an HBM-resident dataset (host sends indices only)."""
    n = device_data.n
    rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
    order = rng.permutation(n)
    full = n - (n % batch_size)
    for start in range(0, full, batch_size):
        yield device_data.take(order[start : start + batch_size])
    if keep_remainder and full < n:
        yield device_data.take(order[full:])


def prefetch_to_device(
    iterator: Iterator[Batch], mesh=None, size: int = 2
) -> Iterator[Batch]:
    """Overlap host-side batch assembly + H2D transfer with device compute.

    A background thread pulls batches (numpy slicing out of the memmapped
    patch cache is the host-side cost) and `device_put`s them ahead of the
    consumer — the device never waits on the host once the pipeline is
    primed. The reference's input path is fully serial with the GPU
    (num_workers=0 DataLoader, ``train.py:49``).
    """
    import queue
    import threading

    import jax

    from mclstexp_tpu.parallel.mesh import shard_batch

    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()

    def producer():
        # Producer failures (device_put OOM, tunnel transport errors, I/O
        # errors slicing the patch cache) are shipped to the consumer and
        # re-raised there — a bare end-of-queue would silently truncate the
        # epoch and train on partial data with no error anywhere.
        try:
            for batch in iterator:
                if mesh is not None:
                    device_batch = shard_batch(batch, mesh)
                else:
                    device_batch = {k: jax.device_put(v) for k, v in batch.items()}
                q.put(device_batch)
        except BaseException as e:  # noqa: BLE001 — transported, not handled
            q.put(e)
        else:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, BaseException):
            raise item
        yield item


def num_train_steps(n: int, batch_size: int, keep_remainder: bool = True) -> int:
    full = n // batch_size
    return full + (1 if keep_remainder and n % batch_size else 0)


def split_fold(
    sections: Sequence[Section], fold: int
) -> tuple[List[Section], Section]:
    """Leave-one-section-out: (train sections, held-out section).

    Matches the reference's fold convention (``dataset.py:161-167``): the
    held-out section is ``sections[fold]``; training uses the rest. (The
    reference materializes the train set via ``set`` subtraction, which
    scrambles section *order* within an epoch, but batches are globally
    shuffled anyway; we keep list order deterministic.)
    """
    test = sections[fold]
    train = [s for i, s in enumerate(sections) if i != fold]
    return train, test
