"""Threaded prefetching batch pipeline (MultiThreadedAugmenter replacement).

The reference feeds its GPU from ``batchgenerators.MultiThreadedAugmenter``
with n_workers *processes* and per-worker seeds
(``experiments/lidc_exp/data_loader.py:205``). Here the augmentation is pure
NumPy/scipy (releases the GIL in the hot loops), so a thread pool + bounded
queue gives the same async host pipeline without pickling batches across
process boundaries — batches land in page-locked host memory ready for a
single device transfer.

A pipeline is (sampler -> transform chain); each worker owns a seeded
``np.random.RandomState`` so batch composition is reproducible per worker,
mirroring the reference's ``seeds=range(n_workers)``.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, List, Optional


class BatchGeneratorBase:
    """Interface: subclass provides generate_train_batch(rng) -> batch dict."""

    def __init__(self, data, batch_size, cf):
        self._data = data
        self.batch_size = batch_size
        self.cf = cf

    def generate_train_batch(self, rng):
        raise NotImplementedError


class MultiThreadedGenerator:
    """Async prefetch of (generator + transforms) with n_workers threads."""

    def __init__(
        self,
        generator: BatchGeneratorBase,
        transforms: Optional[List[Callable]] = None,
        n_workers: int = 4,
        seeds=None,
        queue_size: int = 8,
    ):
        import numpy as np

        self.generator = generator
        self.transforms = transforms or []
        self.n_workers = max(1, n_workers)
        seeds = seeds if seeds is not None else range(self.n_workers)
        self._rngs = [np.random.RandomState(s) for s in seeds]
        self._queue: queue.Queue = queue.Queue(maxsize=queue_size)
        self._stop = threading.Event()
        self._threads: List[threading.Thread] = []
        self._started = False

    def _worker(self, wid):
        rng = self._rngs[wid]
        while not self._stop.is_set():
            try:
                batch = self.generator.generate_train_batch(rng)
                for t in self.transforms:
                    batch = t(batch, rng)
            except Exception as e:  # surface worker errors to the consumer
                self._queue.put(e)
                return
            while not self._stop.is_set():
                try:
                    self._queue.put(batch, timeout=0.25)
                    break
                except queue.Full:
                    continue

    def _start(self):
        if self._started:
            return
        self._started = True
        for wid in range(self.n_workers):
            t = threading.Thread(target=self._worker, args=(wid,), daemon=True)
            t.start()
            self._threads.append(t)

    def __iter__(self):
        return self

    def __next__(self):
        self._start()
        item = self._queue.get()
        if isinstance(item, Exception):
            self.shutdown()
            raise item
        return item

    next = __next__

    def shutdown(self):
        self._stop.set()
        # drain so workers blocked on put() can exit
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass


class SingleThreadedGenerator:
    """Synchronous variant (debugging / deterministic tests)."""

    def __init__(self, generator, transforms=None, seed=0):
        import numpy as np

        self.generator = generator
        self.transforms = transforms or []
        self._rng = np.random.RandomState(seed)

    def __iter__(self):
        return self

    def __next__(self):
        batch = self.generator.generate_train_batch(self._rng)
        for t in self.transforms:
            batch = t(batch, self._rng)
        return batch

    next = __next__

    def shutdown(self):
        pass
