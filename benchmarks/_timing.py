"""Shared TPU timing helper (axon tunnel methodology, CLAUDE.md):

* per-call host sync costs ~28 ms through the tunnel (measured r2 — NOT
  the 2-3 ms of the original calibration), so never sync per iteration:
  queue all iterations asynchronously and read ONE scalar at the end
  (the chip executes queued programs in order, so the last result fences
  the rest) — the bench.py pattern;
* every call must reduce its full output to a scalar (defeats dead-code
  elimination and result memoization) and take an i-dependent input.
"""

import os
import time

import jax

# persistent compilation cache (tunnel compiles of full graphs take
# minutes; repeated bench runs reuse the compiled binary) — same setup
# as bench.py
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def bench_queued(fn, iters: int = 20, warmup: int = 2):
    """fn(i) -> 0-d jax array.  Returns seconds/iteration."""
    for i in range(warmup):
        float(fn(-1 - i))  # compile + warm-up, hard sync
    t0 = time.perf_counter()
    for i in range(iters):
        s = fn(i)
    float(s)  # one scalar read = hard sync of the whole queue
    return (time.perf_counter() - t0) / iters
