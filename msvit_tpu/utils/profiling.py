"""Tracing / profiling helpers (SURVEY §5: the reference has only a
perf_counter Timer; here we add jax.profiler integration as new capability)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard/XProf:

        with profiling.trace("/tmp/trace"):
            jax.block_until_ready(step(...))
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class BlockTimer:
    """Named block timers with running means; device work must be synced by
    the caller (block_until_ready / scalar read) for meaningful numbers."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {
            k: self.totals[k] / self.counts[k] for k in sorted(self.totals)
        }
