"""Device-resident dataset: the whole uint8 image store staged in HBM.

The reference re-reads and re-transforms every batch on the host and
ships it over PCIe each step (`AlexCap/MyDataLoader.py:85-95`, timed
inside its committed step numbers via `train_LSTM.py:77-90`). The
TPU-native formulation inverts that: Face2Text is 8,489 uint8 images of
218x178x3 — ~0.99 GB — against 16 GB of v5e HBM, so the ENTIRE training
split is `jax.device_put` once at startup and each step's input path
collapses to a (batch,)-int32 index transfer (512 bytes at bs=128) plus
an on-device `jnp.take` gather fused into the donated train step with
the resize/normalize preprocess and conv1. Host->device image traffic
per step: zero.

Measured consequence (runs/bench/results.jsonl): the streaming path
(host gather -> prefetch thread -> per-batch device_put of ~15 MB
through the TPU relay) sustained 391 img/s end-to-end vs 6,209 img/s
device-only; the resident path restores end-to-end throughput to the
device rate because the per-step transfer is 4 orders of magnitude
smaller.

Scale-out: the store replicates across the mesh (every chip holds a
copy — 1 GB against 16 GB/chip) while the index batch shards on the
'data' axis, so each device gathers only its local slice of the batch;
no collectives are introduced. When a dataset outgrows the HBM budget
(`fits()` says no), callers fall back to the streaming
`loader.prefetch_batches` path — same batch order by construction, both
are driven by `AlexDataLoader.epoch_position_batches`.
"""

from __future__ import annotations

from typing import Iterator, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class ResidentStore(NamedTuple):
    """Split images + labels living in device memory."""
    images: jax.Array    # (n, H, W, 3) uint8
    labels: jax.Array    # (n, T) int32

    @property
    def num_items(self) -> int:
        return self.images.shape[0]

    @property
    def nbytes(self) -> int:
        return self.images.nbytes + self.labels.nbytes


def store_nbytes(images_np: np.ndarray, labels_np: np.ndarray) -> int:
    return int(images_np.nbytes + labels_np.nbytes)


def device_memory_budget(device=None) -> Optional[int]:
    """Bytes of device memory limit, when the backend reports it
    (TPU does via memory_stats; CPU returns None)."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    return stats.get("bytes_limit") or stats.get("bytes_reservable_limit")


def fits(nbytes: int, budget: Optional[int] = None,
         frac: float = 0.35) -> bool:
    """Whether a store of `nbytes` comfortably fits alongside params,
    optimizer state and activation working set. With no reported budget
    (CPU tests) assume host RAM is ample."""
    if budget is None:
        budget = device_memory_budget()
    if budget is None:
        return True
    return nbytes <= frac * budget


def stage(images_np: np.ndarray, labels_np: np.ndarray,
          mesh: Optional[Mesh] = None) -> ResidentStore:
    """One-time host->device transfer of the whole split. Replicated
    over the mesh when given (every chip gathers locally)."""
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        put = lambda x: jax.device_put(x, repl)      # noqa: E731
    else:
        put = jax.device_put
    return ResidentStore(images=put(np.ascontiguousarray(images_np)),
                         labels=put(np.ascontiguousarray(labels_np)))


def stage_split(loader, split_val: int = 0,
                mesh: Optional[Mesh] = None) -> ResidentStore:
    """Stage one split of an `AlexDataLoader` (position order — indices
    from `epoch_position_batches` address it directly)."""
    images_np, labels_np = loader.resident_arrays(split_val)
    return stage(images_np, labels_np, mesh=mesh)


def gather_batch(store: ResidentStore,
                 idx: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """In-jit batch selection: (B,) int32 positions -> (images, labels).
    A plain HBM gather — XLA fuses it with the on-device preprocess."""
    return (jnp.take(store.images, idx, axis=0),
            jnp.take(store.labels, idx, axis=0))


def make_resident_train_step(train_step):
    """Wrap a (state, images, labels) train step into a
    (state, store, idx) step whose input path is the HBM gather."""
    def step(state, store: ResidentStore, idx):
        images, labels = gather_batch(store, idx)
        return train_step(state, images, labels)
    return step


def shard_resident_train_step(resident_step, mesh: Mesh):
    """jit with state donated, store replicated (never donated — it is
    reused every step), and the index batch sharded on 'data' so each
    device gathers its own slice from its local store copy."""
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    store_sh = ResidentStore(images=repl, labels=repl)
    return jax.jit(resident_step,
                   in_shardings=(None, store_sh, data),
                   donate_argnums=(0,))


def index_stream(loader, split_val: int, batch_size: int, *,
                 iterate: bool, start_images: int = 0) -> Iterator[np.ndarray]:
    """Endless stream of sorted position batches with the training
    loop's semantics: sequential epochs when `iterate` (the reference's
    iterate mode, resume cursor honored), else a fresh shuffle each
    epoch (the multinomial mode's coverage pattern)."""
    while True:
        yield from loader.epoch_position_batches(
            split_val, batch_size, shuffle=not iterate,
            start=start_images if iterate else 0)
        start_images = 0
