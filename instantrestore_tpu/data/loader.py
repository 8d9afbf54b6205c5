"""Multi-worker prefetching data loader (host-side threads).

Replaces the reference's torch DataLoader(num_workers=12,
collate_fn=custom_collate_fn) (coach.py:510-529). Degradation is
numpy/cv2/libjpeg work that releases the GIL, so a thread pool saturates the
cores without process-spawn overhead; batches come out as numpy pytrees ready
for jax.device_put / shard_batch.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, List, Optional

import numpy as np

from instantrestore_tpu.data.datasets import collate


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        num_workers: int = 8,
        drop_last: bool = True,
        collate_fn: Callable = collate,
        prefetch: int = 4,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
    ):
        """``process_index``/``process_count`` enable multi-host feeding:
        every process computes the IDENTICAL global shuffle (same seed) and
        collates only its contiguous 1/process_count slice of each global
        batch — disjoint, covering, and in mesh order, exactly what
        ``parallel.mesh.multihost_shard_batch`` expects (the torch
        DistributedSampler role in the reference's accelerate setup).
        ``batch_size`` stays the GLOBAL batch size."""
        if process_count > 1:
            if batch_size % process_count:
                raise ValueError(
                    f"global batch_size={batch_size} must divide evenly over "
                    f"{process_count} processes"
                )
            if not drop_last:
                raise ValueError(
                    "multi-host loaders require drop_last=True (a partial "
                    "final batch cannot split evenly across processes)"
                )
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.collate_fn = collate_fn
        self.prefetch = prefetch
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batch_indices(self) -> List[List[int]]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(idx)
        nb = len(self)
        batches = [
            idx[i * self.batch_size : (i + 1) * self.batch_size].tolist()
            for i in range(nb)
        ]
        if self.process_count > 1:
            per = self.batch_size // self.process_count
            lo = self.process_index * per
            batches = [b[lo : lo + per] for b in batches]
        return batches

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        batches = self._batch_indices()
        self._epoch += 1
        work_q: "queue.Queue" = queue.Queue()
        results: Dict[int, Any] = {}
        lock = threading.Lock()
        ready_cv = threading.Condition(lock)
        stop = threading.Event()
        # bound in-flight batches: prefetch window + one per worker
        budget = threading.Semaphore(self.prefetch + self.num_workers)

        for bi, batch in enumerate(batches):
            work_q.put((bi, batch))

        def worker():
            while not stop.is_set():
                budget.acquire()
                try:
                    bi, batch_idx = work_q.get_nowait()
                except queue.Empty:
                    budget.release()
                    return
                try:
                    result = self.collate_fn([self.dataset[i] for i in batch_idx])
                except Exception as e:  # propagate to consumer
                    result = e
                with ready_cv:
                    results[bi] = result
                    ready_cv.notify_all()

        threads = [threading.Thread(target=worker, daemon=True) for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        try:
            for next_bi in range(len(batches)):
                with ready_cv:
                    while next_bi not in results:
                        ready_cv.wait(timeout=1.0)
                    result = results.pop(next_bi)
                budget.release()
                if isinstance(result, Exception):
                    raise result
                yield result
        finally:
            stop.set()
