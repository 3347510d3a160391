"""Host-side batcher + double-buffered device prefetch.

Replaces the reference's tf.data pipelines (vae/main.py:56-61,
spair/main.py:77-93). Design points:
  - Images live in host RAM in their compact storage dtype (uint8 for photos);
    normalization and augmentation happen on device (train/steps.py), so PCIe
    traffic is 4x smaller than shipping float32.
  - ``device_prefetch`` keeps N batches in flight with ``jax.device_put`` so
    host batching overlaps device compute (the "double-buffered prefetch"
    north star in BASELINE.json).
  - Batches are dropped-remainder so shapes are static under jit.
"""

from __future__ import annotations

import collections
import itertools
from dataclasses import dataclass
from typing import Iterator, Optional

import jax
import numpy as np


@dataclass
class ArrayDataset:
    """In-memory dataset: images [N, H, W, C] (+ optional labels [N, ...])."""

    images: np.ndarray
    labels: Optional[np.ndarray] = None

    def __len__(self) -> int:
        return self.images.shape[0]

    @property
    def image_shape(self):
        return self.images.shape[1:]


def _epoch_index_batches(
    n_total: int,
    batch_size: int,
    shuffle: bool,
    repeat: bool,
    seed: int,
    drop_remainder: bool,
    process_index: Optional[int],
    process_count: Optional[int],
) -> Iterator[np.ndarray]:
    """Shared index stream: one permutation per epoch, per-host disjoint slices.

    Multi-host: host k of N consumes a disjoint 1/N slice of each epoch's
    index permutation (all hosts draw the same permutation from the shared
    ``seed``, then slice by ``process_index``), so a pod run never feeds two
    hosts the same example in an epoch. ``batch_size`` is the PER-HOST batch.
    Both the host-streaming and device-resident loaders consume this stream,
    so they see identical example orderings for a given seed.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    rng = np.random.RandomState(seed)
    while True:
        idx = rng.permutation(n_total) if shuffle else np.arange(n_total)
        if pc > 1:
            per_host = n_total // pc  # equal disjoint shares; remainder dropped
            idx = idx[pi * per_host : (pi + 1) * per_host]
        n = len(idx)
        stop = n - (n % batch_size) if drop_remainder else n
        if stop == 0 and not drop_remainder:
            stop = n
        for start in range(0, stop, batch_size):
            sel = idx[start : start + batch_size]
            if drop_remainder and len(sel) < batch_size:
                break
            yield sel
        if not repeat:
            return


def iterate_batches(
    ds: ArrayDataset,
    batch_size: int,
    shuffle: bool = True,
    repeat: bool = False,
    seed: int = 0,
    drop_remainder: bool = True,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> Iterator:
    """Yield (images, labels) or images host batches; reshuffles every epoch."""
    for sel in _epoch_index_batches(len(ds), batch_size, shuffle, repeat, seed,
                                    drop_remainder, process_index, process_count):
        imgs = ds.images[sel]
        if ds.labels is not None:
            yield imgs, ds.labels[sel]
        else:
            yield imgs


# Datasets up to this many bytes live resident in HBM (v5e has 16 GB; the
# biggest reference dataset, MultiCUB 100k f32, is 2.8 GB).
DEVICE_RESIDENT_MAX_BYTES = 6 << 30


def device_resident_batches(
    ds: ArrayDataset,
    batch_size: int,
    shuffle: bool = True,
    repeat: bool = False,
    seed: int = 0,
    drop_remainder: bool = True,
    sharding=None,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> Iterator:
    """Device-resident batching: ship the dataset to HBM ONCE, gather batches
    on device.

    MEASURED (v5e behind the remote relay): host->device transfers run at
    ~43-55 MB/s effective and do NOT pipeline, so streaming a B=256 f32
    MultiCUB batch costs ~130-160 ms against a 29 ms train step — the loop was
    12x transfer-bound. With the dataset resident, per-step host traffic is a
    1 KB int32 index array and the gather runs at HBM speed. Example order is
    IDENTICAL to ``iterate_batches`` (same permutation stream, same seed).

    With a multi-device ``sharding`` for the batch output, the gathered batch
    is resharded on device (ICI) after the replicated-gather.
    """
    import jax.numpy as jnp

    imgs = jax.device_put(ds.images)
    labels = jax.device_put(ds.labels) if ds.labels is not None else None

    @jax.jit
    def take(arr, idx):
        return jnp.take(arr, idx, axis=0)

    def place(x):
        return x if sharding is None else jax.device_put(x, sharding)

    for sel in _epoch_index_batches(len(ds), batch_size, shuffle, repeat, seed,
                                    drop_remainder, process_index, process_count):
        idx = jnp.asarray(sel, jnp.int32)
        batch = place(take(imgs, idx))
        if labels is not None:
            yield batch, place(take(labels, idx))
        else:
            yield batch


def device_prefetch(iterator: Iterator, size: int = 2, sharding=None) -> Iterator:
    """Keep ``size`` batches resident on device ahead of the consumer.

    With a NamedSharding over the 'data' mesh axis, each host batch is split
    across devices as it is transferred.
    """

    def put(batch):
        if sharding is None:
            return jax.tree.map(jax.device_put, batch)
        from split_vae_tpu.parallel.mesh import put_global_batch

        return put_global_batch(batch, sharding)

    queue = collections.deque()
    for batch in iterator:
        queue.append(put(batch))
        if len(queue) < size:
            continue
        yield queue.popleft()
    while queue:
        yield queue.popleft()


def take(iterator: Iterator, n: int):
    return itertools.islice(iterator, n)
