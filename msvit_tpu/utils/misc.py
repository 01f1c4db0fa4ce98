"""Misc tools: timers, model size (reference `utils.py:424-432,481-483`)."""

from __future__ import annotations

import time
from typing import Any

import jax
import numpy as np


class Timer:
    """perf_counter stopwatch, same contract as reference `Timer`
    (`utils.py:424-432`) plus context-manager sugar.  Call `.stop()` after
    `jax.block_until_ready` when timing device work."""

    def __init__(self) -> None:
        self._start = time.perf_counter()

    def reset(self) -> None:
        self._start = time.perf_counter()

    def elapsed(self) -> float:
        return time.perf_counter() - self._start

    def __enter__(self) -> "Timer":
        self.reset()
        return self

    def __exit__(self, *exc: Any) -> None:
        self.duration = self.elapsed()


def model_size(params: Any) -> int:
    """Total parameter count of a param pytree (reference `model_size`,
    `utils.py:481-483`)."""
    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(params)))
