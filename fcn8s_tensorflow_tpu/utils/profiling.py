"""Profiling / tracing utilities.

The reference has no profiling support at all (SURVEY.md §5: "Tracing /
profiling: none"); this module is the TPU-native replacement: XLA trace
capture via ``jax.profiler`` (viewable in TensorBoard / Perfetto) and a
steady-state step timer that forces real device synchronization.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA/TPU profiler trace into ``log_dir`` (open with
    TensorBoard's profile plugin or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span context manager for host-side phases."""
    return jax.profiler.TraceAnnotation(name)


def hard_sync(tree) -> None:
    """Force completion of all device work feeding ``tree``.

    ``jax.block_until_ready`` returns immediately on some platforms (the
    axon TPU tunnel among them), so we force a device-to-host copy of one
    scalar-sized slice per leaf — the only reliable barrier.
    """
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "addressable_shards") or hasattr(leaf, "device_buffer"):
            np.asarray(jax.device_get(leaf.ravel()[:1] if hasattr(leaf, "ravel") else leaf))


class StepTimer:
    """Steady-state step timing with warmup exclusion and percentiles.

    Usage::

        timer = StepTimer(warmup=3)
        for batch in data:
            with timer.step():
                state, loss = train_step(state, *batch)
                timer.sync_on(loss)
        print(timer.summary())
    """

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self.times: list[float] = []
        self._count = 0
        self._t0 = None
        self._sync_target = None

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield self
        if self._sync_target is not None:
            hard_sync(self._sync_target)
            self._sync_target = None
        dt = time.perf_counter() - t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)

    def sync_on(self, tree) -> None:
        """Register outputs to hard-sync on before the step's clock stops."""
        self._sync_target = tree

    def summary(self) -> dict:
        if not self.times:
            return {"steps": 0}
        arr = np.asarray(self.times)
        return {
            "steps": len(arr),
            "mean_ms": float(arr.mean() * 1e3),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p95_ms": float(np.percentile(arr, 95) * 1e3),
            "max_ms": float(arr.max() * 1e3),
        }


def memory_stats(device=None) -> dict:
    """Device memory snapshot (HBM bytes in use / limit / peak where the
    backend reports them; CPU backends report {}). The reference has no
    memory observability at all — OOMs surfaced as raw TF aborts."""
    device = device if device is not None else jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)() or {}
    out = {}
    for key in ("bytes_in_use", "bytes_limit", "peak_bytes_in_use",
                "largest_alloc_size"):
        if key in stats:
            out[key] = int(stats[key])
    if "bytes_in_use" in out and "bytes_limit" in out and out["bytes_limit"]:
        out["utilization"] = round(out["bytes_in_use"] / out["bytes_limit"], 4)
    return out
