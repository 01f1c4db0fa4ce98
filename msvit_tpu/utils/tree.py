"""Pytree / config helpers.

TPU-native replacement for the reference's TensorDict stacking and
namespace utilities (`infrastructure/utils.py:30-110,334-447`): in JAX,
"stack an array of modules and vmap over them" is simply
`jax.tree.map(jnp.stack, params)` + `jax.vmap(apply)` — no per-element
fallback machinery is needed because tracing guarantees vmappability.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any, Dict, Mapping, Sequence

import jax
import jax.numpy as jnp


def stack_pytrees(trees: Sequence[Any]) -> Any:
    """Stack a list of identically-structured pytrees along a new leading
    axis (reference `stack_tensor_arr`/`stack_module_arr`,
    `utils.py:30-69`).  Combined with `jax.vmap(model.apply)`, this
    subsumes `run_module_arr` (`utils.py:71-110`)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def flatten_nested_dict(d: Mapping[str, Any], sep: str = ".") -> Dict[str, Any]:
    """Flatten nested dicts into dot-joined keys (reference
    `flatten_nested_dict`, `utils.py:435-444`)."""
    out: Dict[str, Any] = {}

    def rec(prefix: str, value: Any) -> None:
        if isinstance(value, Mapping):
            for k, v in value.items():
                rec(f"{prefix}{sep}{k}" if prefix else str(k), v)
        else:
            out[prefix] = value

    rec("", d)
    return out


def _jsonable(value: Any) -> Any:
    if isinstance(value, Mapping):
        return {k: _jsonable(v) for k, v in sorted(value.items())}
    if isinstance(value, (list, tuple)):
        return [_jsonable(v) for v in value]
    if hasattr(value, "tolist"):
        return value.tolist()
    if hasattr(value, "__dict__") and not isinstance(value, type):
        return _jsonable(vars(value))
    return value


def hash_config(config: Any) -> str:
    """Deterministic sha256 of a config object — experiment identity
    (reference namespace→JSON→sha256, `utils.py:391-400`)."""
    payload = json.dumps(_jsonable(config), sort_keys=True, default=str)
    return hashlib.sha256(payload.encode()).hexdigest()
