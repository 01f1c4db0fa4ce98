"""Global policy knobs — the TPU-native replacement for the reference's
`infrastructure/settings.py:6-15` (which set a global torch device/dtype and
chdir'd at import time).

Here nothing happens at import.  Instead this module exposes:

* ``Policy`` — a tiny dtype-policy struct (param / compute / output dtypes)
  that model configs embed.  The TPU default computes in bfloat16 (MXU
  native) and keeps parameters + softmax statistics in float32.
* ``default_policy()`` / ``parity_policy()`` constructors.
* ``RUNTIME_MODE`` equivalent is a plain function argument everywhere.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

# String names keep configs hashable / serializable; resolve lazily.
_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}


def resolve_dtype(name: Any):
    """Resolve a dtype name (or dtype) to a jnp dtype."""
    if isinstance(name, str):
        return _DTYPES[name]
    return name


@dataclasses.dataclass(frozen=True)
class Policy:
    """Mixed-precision policy.

    param_dtype:   dtype parameters are stored in (f32 master copies).
    compute_dtype: dtype matmuls/convs run in (bf16 targets the MXU).
    output_dtype:  dtype activations are returned in.
    """

    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"
    output_dtype: str = "bfloat16"

    @property
    def param(self):
        return resolve_dtype(self.param_dtype)

    @property
    def compute(self):
        return resolve_dtype(self.compute_dtype)

    @property
    def output(self):
        return resolve_dtype(self.output_dtype)


def default_policy() -> Policy:
    """bf16 compute / f32 params — the TPU production policy."""
    return Policy()


def parity_policy() -> Policy:
    """Full float32 — used for CPU numerical-parity tests vs the PyTorch
    reference (BASELINE.json: <=1e-3 max logit deviation)."""
    return Policy("float32", "float32", "float32")
