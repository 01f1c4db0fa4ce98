"""Object-ndarray comprehension + misc helpers — host-side utilities
(reference `infrastructure/utils.py:263-328,406-500`).

These operate on *host* numpy object arrays (experiment bookkeeping), not
device data; device-side "map over an array of things" is `jax.vmap` /
`jax.tree.map`.  The reference's DimArray helpers are out of scope
(`dimarray` is an experiment-analysis dependency; nothing in the model
zoo consumes them) — `multi_*`, `PTR`, `print_disabled`, `array_of`,
`nested_vars`, `map_dict`, and `call_func_with_kwargs` are the pieces the
models/sandbox actually use, and are provided here.
"""

from __future__ import annotations

import os
import sys
from argparse import Namespace
from typing import Any, Callable, Dict, Iterable, Sequence, Tuple, TypeVar

import numpy as np

_T = TypeVar("_T")


def multi_iter(arr: np.ndarray) -> Iterable[Any]:
    """Flat iteration over any-dtype ndarrays (reference `:266-268`)."""
    for x in np.nditer(arr, flags=["refs_ok"]):
        yield x[()]


def multi_enumerate(arr: np.ndarray) -> Iterable[Tuple[Sequence[int], Any]]:
    it = np.nditer(arr, flags=["multi_index", "refs_ok"])
    for x in it:
        yield it.multi_index, x[()]


def multi_map(
    func: Callable[[Any], Any], arr: np.ndarray, dtype: type = None
) -> np.ndarray:
    if dtype is None:
        dtype = type(func(arr.ravel()[0]))
    result = np.empty_like(arr, dtype=dtype)
    for idx, x in multi_enumerate(arr):
        result[idx] = func(x)
    return result


def multi_zip(*arrs: np.ndarray) -> np.recarray:
    result = np.recarray(
        arrs[0].shape, dtype=[(f"f{i}", arr.dtype) for i, arr in enumerate(arrs)]
    )
    for i, arr in enumerate(arrs):
        setattr(result, f"f{i}", arr)
    return result


def array_of(o: _T) -> np.ndarray:
    """Box any object into a 0-d object ndarray (reference `:474-477`)."""
    m = np.array(None, dtype=object)
    m[()] = o
    return m


class PTR:
    """Single-object box (reference `:406-411`)."""

    def __init__(self, obj: Any) -> None:
        self.obj = obj

    def __iter__(self):
        yield self.obj


class print_disabled:
    """Stdout suppressor context (reference `:414-421`)."""

    def __enter__(self):
        self._original_stdout = sys.stdout
        sys.stdout = open(os.devnull, "w")

    def __exit__(self, exc_type, exc_val, exc_tb):
        sys.stdout.close()
        sys.stdout = self._original_stdout


def nested_vars(n: Namespace) -> Dict[str, Any]:
    """Flatten nested argparse Namespaces (reference `:447-456`)."""
    result: Dict[str, Any] = {}

    def rec(prefix: Tuple[str, ...], ns: Namespace) -> None:
        for k, v in vars(ns).items():
            if isinstance(v, Namespace):
                rec((*prefix, k), v)
            else:
                result[".".join((*prefix, k))] = v

    rec((), n)
    return result


def nested_type(o: Any) -> Any:
    if type(o) in (list, tuple):
        return type(o)(map(nested_type, o))
    if type(o) is dict:
        return {k: nested_type(v) for k, v in o.items()}
    return type(o)


def map_dict(d: Dict[str, Any], func: Callable[[Any], Any]) -> Dict[str, Any]:
    return {
        k: map_dict(v, func) if hasattr(v, "items") else func(v)
        for k, v in d.items()
    }


def call_func_with_kwargs(
    func: Callable, args: Tuple[Any, ...] = (), kwargs: Dict[str, Any] = None
):
    """Call func, dropping kwargs it rejects (reference `:485-492` —
    implemented via signature inspection instead of retry-on-AttributeError,
    which also swallowed unrelated AttributeErrors)."""
    import inspect

    kwargs = dict(kwargs or {})
    try:
        params = inspect.signature(func).parameters
        if not any(
            p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values()
        ):
            kwargs = {k: v for k, v in kwargs.items() if k in params}
    except (TypeError, ValueError):
        pass
    return func(*args, **kwargs)
