"""Dynamic micro-batching inference server.

New capability relative to the reference (it has no serving story at
all — `sandbox/test.py` is a one-shot script); this is the front end a
production deployment of the int8/bf16 serving paths needs: requests
arrive one image at a time, the accelerator wants large static batches.

TPU-first design points:

* **Static bucket shapes.**  XLA compiles one program per input shape,
  so the dispatcher never runs a ragged batch: requests are padded up to
  the next bucket (powers of two up to `max_batch`) and the padding rows
  are sliced off the result.  `warmup()` pre-compiles every bucket so no
  request ever pays a compile.
* **Deadline-based coalescing.**  The dispatcher drains whatever is
  queued; if the batch is still below `max_batch` it waits at most
  `max_wait_ms` for stragglers (classic latency/throughput knob), then
  launches.  Launches are asynchronous (JAX dispatch returns before the
  device finishes), so the host coalesces batch i+1 while the device
  runs batch i.
* **Thread-safe `submit` -> Future.**  Callers block only on their own
  result; the dispatcher thread is the single device user (TPU programs
  are serialized anyway — CLAUDE.md "one process/one queue").

Latency accounting uses a monotonic clock per request
(`queued -> fulfilled`), reported as p50/p95/p99 from `stats()`.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Callable, List, Optional, Sequence

import jax
import numpy as np


def _percentile(xs: List[float], q: float) -> float:
    if not xs:
        return float("nan")
    return float(np.percentile(np.asarray(xs), q))


class BatchingServer:
    """`apply_fn(batch)` must be a jitted function of one [B, ...] array
    (close params over `functools.partial`/donation outside, or pass a
    lambda that applies them as arguments internally)."""

    def __init__(
        self,
        apply_fn: Callable[[np.ndarray], Any],
        example: np.ndarray,  # one example, no batch dim
        max_batch: int = 32,
        max_wait_ms: float = 2.0,
        buckets: Optional[Sequence[int]] = None,
        small_apply_fn: Optional[Callable[[np.ndarray], Any]] = None,
        small_bucket_max: int = 0,
    ):
        """`small_apply_fn`, when given, handles buckets of size
        <= `small_bucket_max` instead of `apply_fn`.  Rationale: the int8
        path's bs=1 latency is unstable on this chip (3.9 -> 5.5-6.0 ms
        across sessions) while bf16's is stable at 4.18 ms
        (benchmarks/RESULTS.md p50 section), so an int8 deployment should
        route tiny batches to a bf16 program — `make_dtype_routed_server`
        wires exactly that.  Output types must match across the two fns."""
        self.apply_fn = apply_fn
        self.small_apply_fn = small_apply_fn
        self.small_bucket_max = int(small_bucket_max)
        self.example_shape = tuple(example.shape)
        self.example_dtype = example.dtype
        if buckets is None:
            buckets = []
            b = 1
            while b < max_batch:
                buckets.append(b)
                b *= 2
            buckets.append(max_batch)
        self.buckets = sorted(set(int(b) for b in buckets))
        self.max_batch = self.buckets[-1]
        self.max_wait = max_wait_ms / 1e3
        self._q: "queue.Queue" = queue.Queue()
        # bounded in-flight launches: the dispatcher coalesces batch i+1
        # while the completer waits on batch i (depth 2 = double buffer)
        self._cq: "queue.Queue" = queue.Queue(maxsize=2)
        self._latencies: List[float] = []
        self._batch_sizes: List[int] = []
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._dispatch, daemon=True)
        self._completer = threading.Thread(target=self._complete, daemon=True)
        self._thread.start()
        self._completer.start()

    # ---- client API ----

    def submit(self, x: np.ndarray) -> Future:
        if tuple(x.shape) != self.example_shape:
            raise ValueError(
                f"request shape {tuple(x.shape)} != {self.example_shape}"
            )
        fut: Future = Future()
        self._q.put((time.monotonic(), np.asarray(x, self.example_dtype), fut))
        return fut

    def warmup(self) -> None:
        """Compile every bucket before serving traffic.

        The fence is a real output fetch, not `block_until_ready`: on the
        tunneled backend block_until_ready returns while compile/load work
        is still in flight (CLAUDE.md), which silently shifted ~70 s of
        warmup into the FIRST request's latency (measured; the first
        post-warmup device_get absorbed it).  device_get of the (small)
        output is an honest end-to-end fence on every backend."""
        for b in self.buckets:
            x = np.zeros((b,) + self.example_shape, self.example_dtype)
            jax.device_get(self._fn_for_bucket(b)(x))

    def stats(self) -> dict:
        with self._lock:
            lats = list(self._latencies)
            sizes = list(self._batch_sizes)
        return {
            "requests": len(lats),
            "p50_ms": _percentile(lats, 50) * 1e3,
            "p95_ms": _percentile(lats, 95) * 1e3,
            "p99_ms": _percentile(lats, 99) * 1e3,
            "mean_batch": float(np.mean(sizes)) if sizes else float("nan"),
            "batches": len(sizes),
        }

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5)
        try:
            self._cq.put_nowait(None)
        except queue.Full:
            pass
        self._completer.join(timeout=5)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ---- dispatcher ----

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.max_batch

    def _fn_for_bucket(self, b: int) -> Callable[[np.ndarray], Any]:
        if self.small_apply_fn is not None and b <= self.small_bucket_max:
            return self.small_apply_fn
        return self.apply_fn

    def _collect(self) -> list:
        """Block for the first request, then coalesce up to max_batch for
        at most max_wait."""
        try:
            first = self._q.get(timeout=0.05)
        except queue.Empty:
            return []
        items = [first]
        deadline = time.monotonic() + self.max_wait
        while len(items) < self.max_batch:
            left = deadline - time.monotonic()
            if left <= 0:
                break
            try:
                items.append(self._q.get(timeout=left))
            except queue.Empty:
                break
        return items

    def _dispatch(self) -> None:
        while not self._stop.is_set():
            items = self._collect()
            if not items:
                continue
            n = len(items)
            b = self._bucket(n)
            batch = np.zeros((b,) + self.example_shape, self.example_dtype)
            for i, (_, x, _) in enumerate(items):
                batch[i] = x
            try:
                out = self._fn_for_bucket(b)(batch)  # async dispatch
            except BaseException as e:  # trace/shape error: fail fast
                for _, _, fut in items:
                    fut.set_exception(e)
                continue
            # hand to the completer; bounded queue applies backpressure
            # (at most 2 batches in flight on the device)
            self._cq.put((out, items))

    def _complete(self) -> None:
        while True:
            task = self._cq.get()
            if task is None:
                return
            out, items = task
            try:
                out = jax.device_get(out)
            except BaseException as e:  # device-side failure
                for _, _, fut in items:
                    fut.set_exception(e)
                continue
            done = time.monotonic()
            with self._lock:
                self._batch_sizes.append(len(items))
                for t0, _, _ in items:
                    self._latencies.append(done - t0)
            for i, (_, _, fut) in enumerate(items):
                fut.set_result(
                    jax.tree_util.tree_map(lambda o: o[i], out)
                )
