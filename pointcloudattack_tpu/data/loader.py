"""Device-feeding loader: host batching + async prefetch.

The reference relies on torch DataLoader workers (SURVEY.md §3.1 "host
process boundary"); here a background thread stages the next batch on
device (``jax.device_put``, optionally mesh-sharded) while the current
one computes — the standard single-host JAX input pipeline.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax
import numpy as np

from pointcloudattack_tpu.data.datasets import iterate_dataset


def prefetch_to_device(
    batch_iter: Iterator,
    size: int = 2,
    sharding=None,
) -> Iterator:
    """Wrap a host batch iterator with an N-deep device prefetch queue."""
    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()
    _ERR = object()

    def put(batch):
        arrays = tuple(
            jax.device_put(np.asarray(a), sharding) for a in batch
        )
        q.put(arrays)

    def worker():
        try:
            for batch in batch_iter:
                put(batch)
        except BaseException as e:  # noqa: BLE001 - re-raised in consumer
            q.put((_ERR, e))
            return
        q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, tuple) and len(item) == 2 and item[0] is _ERR:
            # surface worker failures instead of silently truncating the
            # epoch
            raise item[1]
        yield item


def data_loader(
    dataset,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = False,
    prefetch: int = 2,
    sharding=None,
) -> Iterator:
    """Batched, prefetched, optionally sharded loader over a dataset."""
    host = iterate_dataset(
        dataset, batch_size, shuffle=shuffle, seed=seed, drop_last=drop_last
    )
    if prefetch <= 0:
        for b in host:
            yield tuple(jax.device_put(np.asarray(a), sharding) for a in b)
        return
    yield from prefetch_to_device(host, size=prefetch, sharding=sharding)
