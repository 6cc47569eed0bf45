"""Host-side data loading: threaded prefetch + per-host sharding.

TPU-native replacement for the torch ``DataLoader`` + ``DistributedSampler``
stack the reference uses (reference blip_fine_tune_2.py:251-254,
lavis runner_base.py:506-515): decode/preprocess runs in a thread pool
overlapped with device compute, batches are collated to numpy, and in a
multi-host setup each host reads only its shard of the index space
(``host_shard``), replacing DistributedSampler.

The PrefetchLoader CUDA-stream trick of the reference
(dataloader_utils.py:45-110) is unnecessary: JAX's async dispatch plus the
thread-pool prefetch already overlap host IO with TPU compute.
"""

from __future__ import annotations

import logging
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, List, Sequence

import numpy as np

log = logging.getLogger(__name__)


def host_shard(n: int, host_id: int, num_hosts: int) -> range:
    """Contiguous per-host index shard."""
    per = (n + num_hosts - 1) // num_hosts
    return range(host_id * per, min(n, (host_id + 1) * per))


def default_collate(samples: List[dict]) -> dict:
    """Stack numpy/array leaves; keep strings/lists as lists."""
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        else:
            out[key] = vals
    return out


class DataLoader:
    """Threaded map-style loader.

    - ``shuffle``: per-epoch derangement from ``seed + epoch`` (call
      ``set_epoch`` like a DistributedSampler).
    - drops ``None`` samples (datasets in ``skip_errors`` mode), mirroring
      the reference's collate filter (data_utils.py:14-21) but loudly.
    - ``drop_last`` for static train shapes.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 4,
        collate: Callable = default_collate,
        seed: int = 0,
        host_id: int = 0,
        num_hosts: int = 1,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.collate = collate
        self.seed = seed
        self.epoch = 0
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.prefetch = prefetch
        # failure accounting (SURVEY §5.3): the reference silently shrinks
        # batches on corrupt images; here every drop is warned AND counted
        # so a rotting dataset is visible (epoch summary per-iterator)
        self.dropped_total = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.asarray(host_shard(n, self.host_id, self.num_hosts))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            idx = idx[rng.permutation(len(idx))]
        return idx

    def __len__(self) -> int:
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        indices = self._indices()
        n_batches = len(self)
        batches = [
            indices[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(n_batches)
        ]

        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        dropped = [0]
        # += on the counters is a read-modify-write racing across pool
        # workers; unsynchronized it can lose drops and undercount the
        # epoch summary (the whole point of the accounting)
        dropped_lock = threading.Lock()

        def load_batch(batch_idx: Sequence[int]):
            samples = []
            for j in batch_idx:
                s = self.dataset[j]
                if s is None:
                    log.warning("dropped unreadable sample %d", j)
                    with dropped_lock:
                        dropped[0] += 1
                        self.dropped_total += 1
                    continue
                samples.append(s)
            return self.collate(samples) if samples else None

        def producer():
            try:
                futures = [pool.submit(load_batch, b) for b in batches]
                for f in futures:
                    if stop.is_set():
                        break
                    q.put(f.result())
            finally:
                q.put(StopIteration)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is StopIteration:
                    break
                if item is not None:
                    yield item
        finally:
            stop.set()
            if dropped[0]:
                log.warning(
                    "epoch %d: dropped %d/%d unreadable samples "
                    "(total this loader: %d)",
                    self.epoch, dropped[0], len(indices), self.dropped_total,
                )
            pool.shutdown(wait=False)
