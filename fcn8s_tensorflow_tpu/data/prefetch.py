"""Host -> device prefetch pipeline.

The reference blocks the training thread on ``next(generator)`` every step —
image decode + OpenCV warps run *serially* with the ``sess.run`` (SURVEY.md
§3.2: "no overlap between them — a key inefficiency"). Here a background
thread runs the host pipeline and eagerly ``device_put``s batches with their
target ``NamedSharding``, so H2D DMA for step N+1 overlaps compute of step N
(double/triple buffering on the device side; depth configurable).
"""

from __future__ import annotations

import queue
import threading

import jax


class DevicePrefetcher:
    """Wrap a host batch iterator; yields device-resident (sharded) batches.

    ``sharding`` may be a single sharding applied to every array in the
    batch tuple, or a tuple matching the batch structure.

    ``workers > 1`` runs the HOST side (pulling/producing batches) on a
    small thread pool with an order-preserving reorder buffer — for host
    pipelines heavy enough to outweigh the device step (decode + OpenCV
    augmentation releases the GIL, so threads genuinely overlap). Batch
    ORDER is preserved exactly (each worker tags its pull with a sequence
    number taken under the iterator lock), so seeded-run determinism is
    unaffected; only wall-clock changes.
    """

    _SENTINEL = object()

    def __init__(self, iterator, sharding, depth: int = 2, workers: int = 1):
        self._iterator = iterator
        self._sharding = sharding
        self._queue: queue.Queue = queue.Queue(maxsize=depth)
        self._err = None
        self._stop = threading.Event()
        if workers <= 1:
            self._thread = threading.Thread(target=self._worker, daemon=True)
            self._thread.start()
            self._threads = [self._thread]
        else:
            self._seq_lock = threading.Lock()
            self._next_pull = 0
            self._emit_lock = threading.Lock()
            self._next_emit = 0
            self._reorder: dict[int, object] = {}
            self._emit_cv = threading.Condition(self._emit_lock)
            self._done_workers = 0
            self._n_workers = workers
            self._threads = [
                threading.Thread(target=self._pool_worker, daemon=True)
                for _ in range(workers)
            ]
            for t in self._threads:
                t.start()
            self._thread = self._threads[0]  # close() joins all via _threads

    def _pool_worker(self):
        """Multi-worker host loop: pull (seq, batch) under the iterator
        lock, device_put outside it, then emit strictly in sequence."""
        try:
            while not self._stop.is_set():
                with self._seq_lock:
                    seq = self._next_pull
                    self._next_pull += 1
                    try:
                        batch = next(self._iterator)
                    except StopIteration:
                        batch = self._SENTINEL
                item = (
                    self._SENTINEL if batch is self._SENTINEL
                    else self._put_on_device(batch)
                )
                with self._emit_cv:
                    self._reorder[seq] = item
                    self._emit_cv.notify_all()
                    while not self._stop.is_set():
                        # drain every ready-in-order item (any worker may
                        # be the one whose turn unblocks others)
                        if self._next_emit in self._reorder:
                            out = self._reorder.pop(self._next_emit)
                            self._next_emit += 1
                            self._emit_cv.release()
                            try:
                                self._queue.put(out)
                            finally:
                                self._emit_cv.acquire()
                            continue
                        if seq in self._reorder:
                            # our item not yet due: hand off and move on
                            break
                        break
                if batch is self._SENTINEL:
                    return
        except Exception as exc:  # surface in the consumer thread
            self._err = exc
            self._queue.put(self._SENTINEL)

    def _put_on_device(self, batch):
        if isinstance(batch, tuple):
            shardings = (
                self._sharding
                if isinstance(self._sharding, tuple)
                else (self._sharding,) * len(batch)
            )
            return tuple(jax.device_put(a, s) for a, s in zip(batch, shardings))
        return jax.device_put(batch, self._sharding)

    def _worker(self):
        try:
            for batch in self._iterator:
                if self._stop.is_set():
                    return
                self._queue.put(self._put_on_device(batch))
        except Exception as exc:  # surface in the consumer thread
            self._err = exc
        finally:
            self._queue.put(self._SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self):
        """Stop the worker(s) and join them, so a successor prefetcher can
        safely take over the underlying iterator. Safe to call repeatedly."""
        self._stop.set()
        # drain so workers unblock if waiting on a full queue; bounded wait
        # (daemon threads — a source iterator blocked on IO cannot be
        # interrupted, and must not hang the caller)
        deadline = 50
        while any(t.is_alive() for t in self._threads) and deadline > 0:
            try:
                while True:
                    self._queue.get_nowait()
            except queue.Empty:
                pass
            for t in self._threads:
                t.join(timeout=0.1 / len(self._threads))
            deadline -= 1
