"""Image pipeline: decode / resize / normalize, grayscale→3-channel.

The reference does this host-side through HF `ViTImageProcessor` plus a
grayscale-tiling collate (`sandbox/test.py:35-38`,
`sandbox/subsample_vit.py:68-77`).  Here there are two paths:

* ``preprocess_images`` — host path (numpy/PIL) for arbitrary inputs;
  uses the native C++ preprocessor (`msvit_tpu.native`) when built, else
  numpy/PIL.
* ``preprocess_on_device`` — jittable device path for already-decoded
  uint8 arrays: resize (XLA) + rescale + normalize.  Under jit this fuses
  with the patch-embedding matmul (the BASELINE.json north-star shape:
  "decode/resize/normalize fuses into the patch-embedding conv").
"""

from __future__ import annotations

import dataclasses
from typing import Any, Iterator, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ImagePipelineConfig:
    image_size: int = 224
    mean: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    std: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    method: str = "bilinear"  # resize filter


def to_rgb_array(image: Any) -> np.ndarray:
    """PIL image / ndarray → HWC uint8/float RGB; grayscale is tiled to 3
    channels (reference `process_grayscale`, `sandbox/test.py:35-38`)."""
    arr = np.asarray(image)
    if arr.ndim == 2:
        arr = np.tile(arr[..., None], (1, 1, 3))
    if arr.shape[-1] == 1:
        arr = np.tile(arr, (1, 1, 3))
    if arr.shape[-1] == 4:  # drop alpha
        arr = arr[..., :3]
    return arr


def preprocess_images(
    images: Sequence[Any], config: ImagePipelineConfig = ImagePipelineConfig()
) -> np.ndarray:
    """Host path → [B, S, S, 3] float32, normalized.  Uses the native C++
    kernel when available (see msvit_tpu/native)."""
    s = config.image_size
    arrays = [to_rgb_array(im) for im in images]

    try:
        from msvit_tpu.native import preprocess_batch as native_preprocess

        return native_preprocess(arrays, s, config.mean, config.std)
    except (ImportError, OSError):
        pass

    out = np.empty((len(arrays), s, s, 3), np.float32)
    mean = np.asarray(config.mean, np.float32)
    std = np.asarray(config.std, np.float32)
    for i, arr in enumerate(arrays):
        resized = _resize_bilinear_np(arr.astype(np.float32), s, s)
        out[i] = (resized / 255.0 - mean) / std
    return out


def _resize_bilinear_np(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Half-pixel-centered bilinear resize (numpy fallback)."""
    ih, iw = img.shape[:2]
    ys = (np.arange(h) + 0.5) * ih / h - 0.5
    xs = (np.arange(w) + 0.5) * iw / w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, ih - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, iw - 1)
    y1 = np.clip(y0 + 1, 0, ih - 1)
    x1 = np.clip(x0 + 1, 0, iw - 1)
    ty = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    tx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    a = img[y0[:, None], x0[None, :]]
    b = img[y0[:, None], x1[None, :]]
    c = img[y1[:, None], x0[None, :]]
    d = img[y1[:, None], x1[None, :]]
    top = a * (1 - tx) + b * tx
    bot = c * (1 - tx) + d * tx
    return top * (1 - ty) + bot * ty


def preprocess_on_device(
    images_u8: jnp.ndarray,  # [B, H, W, 3] uint8
    config: ImagePipelineConfig = ImagePipelineConfig(),
) -> jnp.ndarray:
    """Jittable device path: resize + rescale + normalize in the XLA graph."""
    s = config.image_size
    x = images_u8.astype(jnp.float32)
    b = x.shape[0]
    if x.shape[1] != s or x.shape[2] != s:
        x = jax.image.resize(x, (b, s, s, 3), method=config.method)
    mean = jnp.asarray(config.mean)
    std = jnp.asarray(config.std)
    return (x / 255.0 - mean) / std


def decode_jpeg_images(
    blobs: Sequence[bytes],
    config: ImagePipelineConfig = ImagePipelineConfig(),
) -> np.ndarray:
    """Encoded JPEG bytes → normalized [B,S,S,3] f32 via the native fused
    decode+resize+normalize kernel (`native/decode.cpp`; DCT downscaling,
    threaded across the batch).  Falls back to PIL + `preprocess_images`
    when the native decode library is unavailable.  Failed decodes fall
    back to PIL per-image; images PIL can't read either become zeros."""
    try:
        from msvit_tpu.native import decode_preprocess_batch

        out, ok = decode_preprocess_batch(
            blobs, config.image_size, config.mean, config.std
        )
    except (ImportError, OSError):
        out = None
        ok = np.zeros((len(blobs),), bool)
    if out is None:
        out = np.zeros(
            (len(blobs), config.image_size, config.image_size, 3), np.float32
        )
    if not ok.all():
        import io

        from PIL import Image

        for i in np.nonzero(~ok)[0]:
            try:
                img = Image.open(io.BytesIO(blobs[i]))
                out[i] = preprocess_images([img], config)[0]
            except Exception:
                pass  # keep zeros
    return out


def decode_jpeg_images_u8(
    blobs: Sequence[bytes],
    config: ImagePipelineConfig = ImagePipelineConfig(),
) -> np.ndarray:
    """Encoded JPEG bytes → [B,S,S,3] **uint8** (decoded + resized, NOT
    normalized): the wire-efficient host→device format — 4× less
    transfer than f32, with `preprocess_on_device` doing the /255 +
    mean/std on device (where XLA fuses it into the patch embedding).
    Same fallback ladder as `decode_jpeg_images`; note unreadable images
    come out as BLACK (u8 zeros → -mean/std after device normalize),
    where the f32 path yields zeros in normalized space."""
    s = config.image_size
    try:
        from msvit_tpu.native import decode_resize_u8

        out, ok = decode_resize_u8(blobs, s)
    except (ImportError, OSError):
        out = None
        ok = np.zeros((len(blobs),), bool)
    if out is None:
        out = np.zeros((len(blobs), s, s, 3), np.uint8)
    if not ok.all():
        import io

        from PIL import Image

        for i in np.nonzero(~ok)[0]:
            try:
                img = Image.open(io.BytesIO(blobs[i])).convert("RGB")
                arr = to_rgb_array(img).astype(np.float32)
                out[i] = np.clip(
                    _resize_bilinear_np(arr, s, s) + 0.5, 0, 255
                ).astype(np.uint8)
            except Exception:
                pass  # keep zeros
    return out


def prefetch_to_device(
    iterator: Iterator[dict],
    buffer_size: int = 2,
    device=None,
    transform=None,
) -> Iterator[dict]:
    """Double-buffered host→device prefetch: a background thread runs the
    (decode/preprocess) iterator and eagerly `device_put`s each batch, so
    the host prepares batch i+1..i+buffer_size while the device computes
    on batch i.  The reference has no overlap at all — its DataLoader
    collate blocks the training loop (`sandbox/predictive.py:98`).

    ``transform`` (optional) maps the device-put dict to its final form
    inside the worker — e.g. a jitted `preprocess_on_device` that turns
    wire-format uint8 pixels into normalized f32 on device; the work is
    queued asynchronously, so it overlaps like everything else."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
    sentinel = object()
    err: list = []
    stop = threading.Event()

    def _put(item) -> bool:
        # Bounded put so the worker notices when the consumer abandons
        # the generator (close/GC) instead of pinning `buffer_size`
        # device batches forever on a blocked q.put.
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterator:
                if stop.is_set():
                    return
                item = {
                    k: (jax.device_put(v, device) if isinstance(v, np.ndarray) else v)
                    for k, v in item.items()
                }
                if transform is not None:
                    item = transform(item)
                if not _put(item):
                    return
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            _put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
        # Drain so a worker blocked mid-put can observe the stop event.
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass


def load_image_batches(
    dataset_id: str,
    split: str = "train",
    batch_size: int = 32,
    config: ImagePipelineConfig = ImagePipelineConfig(),
    streaming: bool = True,
    image_key: str = "image",
    label_key: Optional[str] = "label",
    shuffle_seed: Optional[int] = None,
    prefetch: int = 2,
    native_decode: bool = True,
    wire_dtype: str = "uint8",
) -> Iterator[dict]:
    """HF-hub loader (network/cache-gated): yields
    {"pixel_values": [B,S,S,3] f32, "labels": [B] int or None} — the
    TPU-native analog of the reference's DataLoader + ViTImageProcessor
    collate (`sandbox/subsample_vit.py:64-80`).

    With ``native_decode`` the image column is read as raw encoded bytes
    and decoded by the C++ JPEG kernel; with ``prefetch > 0`` batches are
    prepared and device_put by a background thread (double buffering).
    ``wire_dtype="uint8"`` (default, requires prefetch) ships resized
    uint8 over the host→device link (4× less traffic) and normalizes on
    device; ``"float32"`` normalizes on host."""
    try:
        import datasets  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover
        raise ImportError("`datasets` is required for load_image_batches") from e

    ds = datasets.load_dataset(dataset_id, split=split, streaming=streaming)
    if native_decode:
        try:
            ds = ds.cast_column(image_key, datasets.Image(decode=False))
        except Exception:
            native_decode = False
    if shuffle_seed is not None:
        ds = ds.shuffle(seed=shuffle_seed)

    u8_wire = wire_dtype == "uint8" and native_decode and prefetch > 0

    def gen() -> Iterator[dict]:
        images, labels = [], []
        for row in ds:
            images.append(row[image_key])
            if label_key is not None and label_key in row:
                labels.append(row[label_key])
            if len(images) == batch_size:
                if native_decode:
                    # File-backed HF datasets (e.g. imagefolder) yield
                    # {"bytes": None, "path": ...} under decode=False —
                    # read those files off disk instead of decoding None.
                    blobs = []
                    for im in images:
                        b = im.get("bytes")
                        if b is None and im.get("path"):
                            with open(im["path"], "rb") as f:
                                b = f.read()
                        blobs.append(b if b is not None else b"")
                    pix = (
                        decode_jpeg_images_u8(blobs, config)
                        if u8_wire
                        else decode_jpeg_images(blobs, config)
                    )
                else:
                    pix = preprocess_images(images, config)
                yield {
                    "pixel_values": pix,
                    "labels": np.asarray(labels) if labels else None,
                }
                images, labels = [], []

    it = gen()
    if prefetch <= 0:
        return it
    transform = None
    if u8_wire:
        normalize = jax.jit(lambda u8: preprocess_on_device(u8, config))

        def transform(item):
            return {**item, "pixel_values": normalize(item["pixel_values"])}

    return prefetch_to_device(it, buffer_size=prefetch, transform=transform)
