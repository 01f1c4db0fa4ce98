"""Mesh construction.

Axes:
  "data"  — data parallel (batch sharding); rides ICI/DCN transparently.
  "model" — tensor parallel (attention heads, MLP hidden dim).

At reference scale (ViT-B, ~86M params) a pure-data mesh is optimal
(SURVEY §2.10 TPU-native plan); "model" > 1 is for larger configs and for
exercising the TP path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("data", "model") mesh.

    dp defaults to n_devices // tp.  Device order follows
    `jax.devices()`, which on TPU enumerates along ICI rings, keeping the
    fast-changing TP axis on nearest neighbors.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        if n % tp:
            raise ValueError(f"{n} devices not divisible by tp={tp}")
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp * tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("data", "model"))
