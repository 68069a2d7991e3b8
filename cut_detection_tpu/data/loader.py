"""Threaded prefetching batch loader.

Replaces ``torch.utils.data.DataLoader(num_workers=3)``
(supervised_training.py:78-91, learn_contrasts.py:59-61) with a
thread-pool loader: JPEG decode in cv2 releases the GIL, so threads give
process-free parallelism, and batches are assembled into contiguous uint8
arrays ready for a single host->device transfer.
"""

from __future__ import annotations

import concurrent.futures as cf
import queue
import threading

import numpy as np


def _collate(items: list[dict]) -> dict:
    out = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        first = np.asarray(vals[0])
        if first.ndim == 0:
            out[key] = np.asarray(vals)
        else:
            out[key] = np.stack(vals)
    return out


def iter_batches(dataset, batch_size: int, *, shuffle: bool = False,
                 drop_last: bool = False, seed: int | None = None,
                 indices=None, num_workers: int = 0):
    """Yield collated dict batches from an indexable dataset.

    ``indices`` restricts/reorders the dataset (torch ``Subset`` analog,
    supervised_training.py:75-76).
    """
    if indices is None:
        indices = np.arange(len(dataset))
    else:
        indices = np.asarray(indices)
    if shuffle:
        rng = np.random.default_rng(seed)
        indices = rng.permutation(indices)
    n = len(indices)

    def load(i):
        return dataset[int(i)]

    if num_workers <= 0:
        for s in range(0, n, batch_size):
            chunk = indices[s: s + batch_size]
            if drop_last and len(chunk) < batch_size:
                break
            yield _collate([load(i) for i in chunk])
        return

    with cf.ThreadPoolExecutor(max_workers=num_workers) as pool:
        for s in range(0, n, batch_size):
            chunk = indices[s: s + batch_size]
            if drop_last and len(chunk) < batch_size:
                break
            yield _collate(list(pool.map(load, chunk)))


class PrefetchLoader:
    """Iterator wrapper that prefetches ``depth`` batches on a thread.

    Keeps host decode/augment running while the device computes, the
    standard double-buffering needed to hide input latency on TPU.
    """

    _SENTINEL = object()

    def __init__(self, iterable, depth: int = 2, on_close=None):
        if depth <= 0:
            # queue.Queue(maxsize=0) is UNBOUNDED — a depth of 0 would
            # prefetch the entire stream into host RAM, the opposite of
            # what any caller means.  "No prefetch" is: don't wrap.
            raise ValueError(
                f"PrefetchLoader depth must be >= 1, got {depth} "
                "(for no prefetch, iterate the source directly)")
        self.iterable = iterable
        self.depth = depth
        self._stop = threading.Event()
        self._q: queue.Queue | None = None
        self._error: list[BaseException] = []
        self._consumed = False
        self._on_close = on_close
        self._close_lock = threading.Lock()

    def close(self) -> None:
        """Stop the producer thread (for consumers that break early —
        e.g. ``--frame-limit`` — so decode doesn't run ahead forever).

        Fires the ``on_close`` callback exactly once, no matter how many
        paths close the loader (explicit close, end-of-drain, error
        paths) — the serving daemon uses it to release its bounded
        decode-ahead slot the moment the decoded frames are done with.
        """
        self._stop.set()
        with self._close_lock:
            cb, self._on_close = self._on_close, None
        if cb is not None:
            cb()

    def start(self) -> "PrefetchLoader":
        """Begin producing into the bounded queue NOW (idempotent).

        Lets a caller start decode-ahead before it is ready to consume —
        the serving daemon uses this to overlap request N+1's host decode
        with request N's device compute (the device lock only serializes
        the consuming side).  ``__iter__`` calls this implicitly, so the
        loader is single-use either way.
        """
        if self._q is not None:
            return self
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        self._q = q
        error = self._error
        sentinel = PrefetchLoader._SENTINEL

        def producer():
            try:
                for item in self.iterable:
                    while not self._stop.is_set():
                        try:
                            q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
            except BaseException as e:  # propagate to consumer
                error.append(e)
            finally:
                while True:
                    try:
                        q.put(sentinel, timeout=0.1)
                        break
                    except queue.Full:
                        if self._stop.is_set():
                            return
        t = threading.Thread(target=producer, daemon=True)
        t.start()
        return self

    def __iter__(self):
        # NOT a generator: the single-use check must fire at iter()
        # time, not at the first next() (a generator body is deferred).
        if self._consumed:
            # Single-use by design (start() binds one producer to one
            # queue); a second pass would block forever on an empty
            # queue whose sentinel was already taken — fail loudly.
            raise RuntimeError("PrefetchLoader is single-use; construct "
                               "a new one to iterate again")
        self._consumed = True
        self.start()
        return self._drain(self._q)

    def _drain(self, q):
        try:
            while True:
                item = q.get()
                if item is PrefetchLoader._SENTINEL:
                    if self._error:
                        raise self._error[0]
                    return
                yield item
        finally:
            self.close()
