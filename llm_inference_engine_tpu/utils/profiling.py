"""Profiling / timing utilities.

The reference's only perf affordance is a PERF macro that removes its
per-kernel device syncs (reference: src/layers/context_attention.cpp:188-191)
— it has no tracer. Here:
- ``trace``: jax.profiler wrapper producing an xplane trace viewable in
  TensorBoard/Perfetto/xprof;
- ``Timer`` / ``timeit``: wall-clock timing with a real execution fence
  (a tiny device->host transfer — ``block_until_ready`` alone can lie over
  remote-tunnel transports).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np

__all__ = ["trace", "Timer", "timeit", "fence"]


def fence(tree) -> None:
    """Force completion of a computation: block + transfer one element."""
    jax.block_until_ready(tree)
    leaves = jax.tree.leaves(tree)
    if leaves:
        np.asarray(leaves[0]).ravel()[:1]


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context: xplane trace into log_dir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Accumulating named wall-clock sections."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"{name}: {tot*1e3:.2f} ms total, {n} calls, "
                         f"{tot/n*1e3:.3f} ms/call")
        return "\n".join(lines)


def timeit(fn: Callable, *args, repeats: int = 5, warmup: int = 1,
           **kwargs) -> float:
    """Best-of-N wall time of fn(*args) with execution fences. Returns
    seconds."""
    for _ in range(warmup):
        fence(fn(*args, **kwargs))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fence(fn(*args, **kwargs))
        best = min(best, time.perf_counter() - t0)
    return best
