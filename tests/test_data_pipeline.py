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
