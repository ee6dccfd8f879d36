"""Host-side prefetching batch loader.

The reference feeds trainers through torch DataLoader worker processes +
DistributedSampler (trainer.py:274-279, trainer_combined_layout.py:288).
TPU-native equivalent: a thread-pool prefetcher that decodes/transforms the
next batches while the chip runs the current step, with per-process sharding
for multi-host (each process sees a disjoint slice of every epoch, like
DistributedSampler; DiffusionTrainer assembles the global batch from local
shards via make_array_from_process_local_data).

Threads (not processes) suffice here: the per-item work is PIL decode +
numpy, which releases the GIL in the hot parts, and the consumer is a
device-bound training loop.
"""
from __future__ import annotations

import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, List, Sequence


def collate(items: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack array fields, keep strings/lists as lists (reference
    dataloader collation for the layout batch schema)."""
    import numpy as np

    out: Dict[str, Any] = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        first = vals[0]
        if hasattr(first, "shape"):
            out[key] = np.stack(vals)
        else:
            out[key] = vals
    return out


class PrefetchLoader:
    """Infinite epoch-shuffled batch iterator with background prefetch.

    dataset: indexable with __len__; batch_size is the PER-PROCESS batch;
    process_index/process_count shard each epoch like DistributedSampler
    (disjoint, padded by dropping the remainder)."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, num_workers: int = 4, prefetch: int = 2,
                 process_index: int = 0, process_count: int = 1):
        assert batch_size > 0 and prefetch >= 1
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count

    def _epoch_batches(self, epoch: int) -> List[Sequence[int]]:
        order = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + epoch).shuffle(order)
        local = order[self.process_index::self.process_count]
        n_full = len(local) // self.batch_size
        return [local[i * self.batch_size:(i + 1) * self.batch_size]
                for i in range(n_full)]

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def fetch(idxs):
            return collate([self.dataset[i] for i in idxs])

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                epoch = 0
                while not stop.is_set():
                    futures = [pool.submit(fetch, idxs)
                               for idxs in self._epoch_batches(epoch)]
                    for fut in futures:
                        if stop.is_set():
                            for f in futures:
                                f.cancel()
                            return
                        q.put(fut.result())
                    epoch += 1

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                yield q.get()
        finally:
            stop.set()
            # drain so the producer's blocked put() can observe stop
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
