"""Data pipeline tests: registry contents, grayscale handling, native C++
preprocessor vs the numpy path, device path consistency."""

import numpy as np
import pytest

import jax.numpy as jnp

from msvit_tpu.data import (
    DATASETS,
    ImagePipelineConfig,
    dataset_names,
    preprocess_images,
)
from msvit_tpu.data.pipeline import _resize_bilinear_np, preprocess_on_device


def test_registry_matches_reference():
    # same domains and headline entries as infrastructure/dataset.py
    assert set(DATASETS) == {
        "Common", "Ego", "Face", "Pose", "Hand", "Satellite", "Medical", "Miscs",
    }
    assert ("ILSVRC/imagenet-1k", 1000) in DATASETS["Common"]
    assert len(dataset_names()) == sum(len(v) for v in DATASETS.values())


def test_preprocess_grayscale_and_rgb():
    rng = np.random.default_rng(0)
    gray = rng.integers(0, 255, (50, 60), np.uint8)
    rgb = rng.integers(0, 255, (40, 30, 3), np.uint8)
    cfg = ImagePipelineConfig(image_size=32)
    out = preprocess_images([gray, rgb], cfg)
    assert out.shape == (2, 32, 32, 3)
    assert out.dtype == np.float32
    # normalization with mean/std 0.5 maps [0,255] -> [-1, 1]
    assert out.min() >= -1.001 and out.max() <= 1.001
    # grayscale tiled: channels equal
    np.testing.assert_allclose(out[0, ..., 0], out[0, ..., 1], atol=1e-5)


def test_native_matches_numpy():
    native = pytest.importorskip("msvit_tpu.native")
    rng = np.random.default_rng(1)
    imgs = [
        rng.integers(0, 255, (37, 53, 3), np.uint8),
        rng.integers(0, 255, (100, 80, 3), np.uint8),
    ]
    cfg = ImagePipelineConfig(image_size=24)
    got = native.preprocess_batch(imgs, 24, cfg.mean, cfg.std)
    mean = np.asarray(cfg.mean, np.float32)
    std = np.asarray(cfg.std, np.float32)
    for i, im in enumerate(imgs):
        want = (
            _resize_bilinear_np(im.astype(np.float32), 24, 24) / 255.0 - mean
        ) / std
        np.testing.assert_allclose(got[i], want, atol=1e-4)


def test_device_path():
    rng = np.random.default_rng(2)
    u8 = jnp.asarray(rng.integers(0, 255, (2, 64, 48, 3), np.uint8))
    out = preprocess_on_device(u8, ImagePipelineConfig(image_size=32))
    assert out.shape == (2, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())


def _jpeg_blobs(n=6, size=160, seed=0):
    import io

    from PIL import Image

    rng = np.random.default_rng(seed)
    blobs = []
    for _ in range(n):
        small = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        img = Image.fromarray(small).resize((size, size), Image.BILINEAR)
        buf = io.BytesIO()
        img.save(buf, "JPEG", quality=95)
        blobs.append(buf.getvalue())
    return blobs


def test_native_jpeg_decode_matches_pil():
    """decode.cpp (DCT-scaled decode + fused resize/normalize) agrees with
    the PIL decode + preprocess path within JPEG-decoder tolerance."""
    import io

    from PIL import Image

    pytest.importorskip("msvit_tpu.native")
    from msvit_tpu.data.pipeline import ImagePipelineConfig, decode_jpeg_images
    from msvit_tpu.data.pipeline import preprocess_images

    blobs = _jpeg_blobs()
    cfg = ImagePipelineConfig(image_size=112)
    out = decode_jpeg_images(blobs, cfg)
    ref = preprocess_images(
        [Image.open(io.BytesIO(b)) for b in blobs], cfg
    )
    assert out.shape == ref.shape == (6, 112, 112, 3)
    # normalized units (mean 0.5 / std 0.5): 0.05 ≈ 6/255 pixel levels,
    # covering IDCT implementation + DCT-downscale differences
    assert float(np.abs(out - ref).mean()) < 0.05


def test_native_jpeg_decode_corrupt_blob_falls_back():
    from msvit_tpu.data.pipeline import ImagePipelineConfig, decode_jpeg_images

    blobs = _jpeg_blobs(2)
    blobs.append(b"not a jpeg at all")
    out = decode_jpeg_images(blobs, ImagePipelineConfig(image_size=64))
    assert out.shape == (3, 64, 64, 3)
    assert np.isfinite(out).all()
    assert np.abs(out[:2]).sum() > 0
    assert np.abs(out[2]).sum() == 0  # unreadable anywhere -> zeros


def test_prefetch_to_device_preserves_order_and_content():
    from msvit_tpu.data.pipeline import prefetch_to_device

    batches = [
        {"pixel_values": np.full((2, 4, 4, 3), i, np.float32), "labels": None}
        for i in range(5)
    ]
    got = list(prefetch_to_device(iter(batches), buffer_size=2))
    assert len(got) == 5
    for i, b in enumerate(got):
        assert float(jnp.mean(b["pixel_values"])) == float(i)
        assert b["labels"] is None


def test_prefetch_propagates_worker_errors():
    from msvit_tpu.data.pipeline import prefetch_to_device

    def bad_gen():
        yield {"pixel_values": np.zeros((1, 2, 2, 3), np.float32)}
        raise RuntimeError("decode exploded")

    it = prefetch_to_device(bad_gen(), buffer_size=1)
    next(it)
    with pytest.raises(RuntimeError, match="decode exploded"):
        list(it)


def test_u8_wire_decode_matches_f32_path():
    """decode_jpeg_images_u8 + preprocess_on_device == decode_jpeg_images
    within uint8 rounding (the wire-efficient host→device format)."""
    from msvit_tpu.data.pipeline import (
        ImagePipelineConfig,
        decode_jpeg_images,
        decode_jpeg_images_u8,
        preprocess_on_device,
    )

    blobs = _jpeg_blobs()
    blobs.append(b"corrupt")  # exercises the PIL/zero fallback ladder too
    cfg = ImagePipelineConfig(image_size=96)
    u8 = decode_jpeg_images_u8(blobs, cfg)
    assert u8.shape == (7, 96, 96, 3) and u8.dtype == np.uint8
    on_dev = np.asarray(preprocess_on_device(jnp.asarray(u8), cfg))
    ref = decode_jpeg_images(blobs, cfg)
    # identical decode + identical resize kernel; only the uint8 rounding
    # differs (±0.5 pixel level = 0.004 in normalized units)
    assert float(np.abs(on_dev[:-1] - ref[:-1]).max()) < 0.02
    # unreadable images: u8 wire yields black pixels (-1 normalized);
    # the f32 path yields zeros in normalized space — documented delta
    assert np.all(u8[-1] == 0)
    assert np.abs(ref[-1]).sum() == 0
