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
    """

    _SENTINEL = object()

    def __init__(self, iterator, sharding, depth: int = 2):
        self._iterator = iterator
        self._sharding = sharding
        self._queue: queue.Queue = queue.Queue(maxsize=depth)
        self._err = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

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
        """Stop the worker and join it, so a successor prefetcher can safely
        take over the underlying iterator. Safe to call multiple times."""
        self._stop.set()
        # drain so the worker unblocks if it is waiting on a full queue;
        # bounded wait (daemon thread — a source iterator blocked on IO
        # cannot be interrupted, and must not hang the caller)
        deadline = 50
        while self._thread.is_alive() and deadline > 0:
            try:
                while True:
                    self._queue.get_nowait()
            except queue.Empty:
                pass
            self._thread.join(timeout=0.1)
            deadline -= 1
