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
    """Yield (images, labels) or images batches; reshuffles every epoch.

    Multi-host: host k of N consumes a disjoint 1/N slice of each epoch's
    index permutation (all hosts draw the same permutation from the shared
    ``seed``, then slice by ``process_index``), so a pod run never feeds two
    hosts the same example in an epoch. ``batch_size`` is the PER-HOST batch.
    Defaults read ``jax.process_index()/process_count()`` — single-host runs
    are unaffected.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    n_total = len(ds)
    rng = np.random.RandomState(seed)
    epoch = 0
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
            imgs = ds.images[sel]
            if ds.labels is not None:
                yield imgs, ds.labels[sel]
            else:
                yield imgs
        epoch += 1
        if not repeat:
            return


def device_prefetch(iterator: Iterator, size: int = 2, sharding=None) -> Iterator:
    """Keep ``size`` batches resident on device ahead of the consumer.

    With a NamedSharding over the 'data' mesh axis, each host batch is split
    across devices as it is transferred.
    """

    def put(batch):
        if sharding is None:
            return jax.tree.map(jax.device_put, batch)
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

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
