"""Native (C++) runtime components, bound via ctypes.

Currently: the batched image preprocessor (resize + normalize) used by
`msvit_tpu.data.pipeline.preprocess_images`.  The shared library is
compiled on first import with g++ (cached next to the source); if no
toolchain is available the import fails and callers fall back to numpy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "preprocess.cpp")
# built artifact lives in a non-package subdir so module-walking tools
# (pkgutil, pytest collection) never mistake it for a Python extension
_LIB = os.path.join(_DIR, "_build", "libmsvit_preprocess.so")


def _build() -> None:
    os.makedirs(os.path.dirname(_LIB), exist_ok=True)
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-pthread",
        _SRC,
        "-o",
        _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(
        _SRC
    ):
        _build()
    lib = ctypes.CDLL(_LIB)
    lib.preprocess_batch.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.preprocess_batch.restype = None
    return lib


_lib = _load()


def preprocess_batch(
    images: Sequence[np.ndarray],
    size: int,
    mean: Tuple[float, float, float],
    std: Tuple[float, float, float],
) -> np.ndarray:
    """[HWC uint8]×B (any per-image sizes) → [B, size, size, 3] float32."""
    batch = len(images)
    contiguous = [np.ascontiguousarray(im, dtype=np.uint8) for im in images]
    ptrs = (ctypes.c_void_p * batch)(
        *(im.ctypes.data for im in contiguous)
    )
    dims = np.empty((batch, 3), np.int32)
    for i, im in enumerate(contiguous):
        if im.ndim == 2:
            dims[i] = (im.shape[0], im.shape[1], 1)
        else:
            dims[i] = (im.shape[0], im.shape[1], im.shape[2])
    out = np.empty((batch, size, size, 3), np.float32)
    mean_arr = np.asarray(mean, np.float32)
    std_arr = np.asarray(std, np.float32)
    _lib.preprocess_batch(
        ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)),
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        batch,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        size,
        mean_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
