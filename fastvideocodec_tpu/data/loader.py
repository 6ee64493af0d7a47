"""Host->device input pipeline: background-thread batching + prefetch.

The reference relies on torch DataLoader workers (train.py:181); here a
simple double-buffered thread keeps the TPU fed (jax.device_put happens
while the previous step computes)."""

from __future__ import annotations

import queue
import threading

import jax
import numpy as np


def prefetch_batches(dataset, batch_indices, batch_size: int = 1, depth: int = 2):
    """Yields device-put numpy batches stacked from dataset[idx]."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = object()

    def worker():
        batch = []
        for idx in batch_indices:
            batch.append(np.asarray(dataset[idx]))
            if len(batch) == batch_size:
                q.put(jax.device_put(np.stack(batch)))
                batch = []
        if batch:
            q.put(jax.device_put(np.stack(batch)))
        q.put(stop)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            break
        yield item
