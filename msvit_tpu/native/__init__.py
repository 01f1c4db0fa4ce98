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
_SRC_DECODE = os.path.join(_DIR, "decode.cpp")
# built artifacts live in a non-package subdir so module-walking tools
# (pkgutil, pytest collection) never mistake them for Python extensions
_LIB = os.path.join(_DIR, "_build", "libmsvit_preprocess.so")
_LIB_DECODE = os.path.join(_DIR, "_build", "libmsvit_decode.so")


def _build(src: str, lib: str, extra: tuple = ()) -> None:
    os.makedirs(os.path.dirname(lib), exist_ok=True)
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-pthread",
        src,
        "-o",
        lib,
        *extra,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(
        _SRC
    ):
        _build(_SRC, _LIB)
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


def _load_decode() -> ctypes.CDLL:
    """JPEG decode library (links libjpeg-turbo); built lazily on first
    use so environments without libjpeg headers still get the resize lib."""
    if not os.path.exists(_LIB_DECODE) or os.path.getmtime(
        _LIB_DECODE
    ) < os.path.getmtime(_SRC_DECODE):
        _build(_SRC_DECODE, _LIB_DECODE, extra=("-ljpeg",))
    lib = ctypes.CDLL(_LIB_DECODE)
    lib.decode_preprocess_batch.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_size_t),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.decode_preprocess_batch.restype = None
    lib.decode_resize_u8_batch.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_size_t),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.decode_resize_u8_batch.restype = None
    lib.decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_size_t),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.decode_batch.restype = None
    return lib


_lib = _load()
_lib_decode = None


def _decode_lib() -> ctypes.CDLL:
    global _lib_decode
    if _lib_decode is None:
        _lib_decode = _load_decode()
    return _lib_decode


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


def decode_preprocess_batch(
    blobs: Sequence[bytes],
    size: int,
    mean: Tuple[float, float, float],
    std: Tuple[float, float, float],
) -> Tuple[np.ndarray, np.ndarray]:
    """Encoded JPEG blobs → ([B, size, size, 3] float32 normalized,
    ok [B] bool).  Decode (with DCT downscaling), bilinear resize and
    normalize run fused in C++ threads (decode.cpp)."""
    batch = len(blobs)
    bufs = [np.frombuffer(b, np.uint8) for b in blobs]
    ptrs = (ctypes.c_void_p * batch)(*(b.ctypes.data for b in bufs))
    lens = (ctypes.c_size_t * batch)(*(len(b) for b in blobs))
    out = np.empty((batch, size, size, 3), np.float32)
    ok = np.zeros((batch,), np.int32)
    mean_arr = np.asarray(mean, np.float32)
    std_arr = np.asarray(std, np.float32)
    _decode_lib().decode_preprocess_batch(
        ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)),
        ctypes.cast(lens, ctypes.POINTER(ctypes.c_size_t)),
        batch,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        size,
        mean_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out, ok.astype(bool)


def decode_resize_u8(
    blobs: Sequence[bytes], size: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Encoded JPEG blobs → ([B, size, size, 3] uint8, ok [B] bool).
    Decode (DCT downscaling) + bilinear resize, NO normalization — the
    wire-efficient host→device format (4× smaller than f32; normalize on
    device with `data.pipeline.preprocess_on_device`)."""
    batch = len(blobs)
    bufs = [np.frombuffer(b, np.uint8) for b in blobs]
    ptrs = (ctypes.c_void_p * batch)(*(b.ctypes.data for b in bufs))
    lens = (ctypes.c_size_t * batch)(*(len(b) for b in blobs))
    out = np.empty((batch, size, size, 3), np.uint8)
    ok = np.zeros((batch,), np.int32)
    _decode_lib().decode_resize_u8_batch(
        ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)),
        ctypes.cast(lens, ctypes.POINTER(ctypes.c_size_t)),
        batch,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        size,
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out, ok.astype(bool)


def decode_jpeg_batch(
    blobs: Sequence[bytes], max_h: int, max_w: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Encoded JPEG blobs → (packed [B, max_h, max_w, 3] uint8,
    dims [B, 2] actual (h, w), ok [B] bool)."""
    batch = len(blobs)
    bufs = [np.frombuffer(b, np.uint8) for b in blobs]
    ptrs = (ctypes.c_void_p * batch)(*(b.ctypes.data for b in bufs))
    lens = (ctypes.c_size_t * batch)(*(len(b) for b in blobs))
    out = np.zeros((batch, max_h, max_w, 3), np.uint8)
    dims = np.zeros((batch, 2), np.int32)
    ok = np.zeros((batch,), np.int32)
    _decode_lib().decode_batch(
        ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)),
        ctypes.cast(lens, ctypes.POINTER(ctypes.c_size_t)),
        batch,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        max_h,
        max_w,
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out, dims, ok.astype(bool)
