"""On-device batched image augmentations (jittable, static shapes).

The reference trains on raw dataset images with no augmentation (its
sandbox scripts feed `preprocess_images` output straight to the model);
these are the standard classification-training augments a production
user expects, built TPU-first:

* every op is `jit`-able and batched — one fused elementwise pass over
  the [B, H, W, C] tensor on device, no host round-trips;
* randomness is explicit (`rng` argument, split per op) — deterministic
  given the key, so the resumable-data story (data/resumable.py) extends
  to augmentation;
* static shapes throughout: crops are implemented as a resample of a
  statically-shaped window grid, cutmix as a rectangle *mask* (the box
  is data, not shape).

Label-mixing augments (mixup/cutmix) return the mixed one-hot targets,
matching the standard soft-target cross-entropy formulation.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def random_flip(
    rng: jax.Array, images: jnp.ndarray
) -> jnp.ndarray:
    """Horizontal flip, per image, p=0.5.  [B, H, W, C] NHWC."""
    flip = jax.random.bernoulli(rng, 0.5, (images.shape[0], 1, 1, 1))
    return jnp.where(flip, images[:, :, ::-1, :], images)


def random_brightness_contrast(
    rng: jax.Array,
    images: jnp.ndarray,
    brightness: float = 0.2,
    contrast: float = 0.2,
) -> jnp.ndarray:
    """Per-image multiplicative brightness and contrast jitter around the
    per-image mean (one fused elementwise pass)."""
    kb, kc = jax.random.split(rng)
    b = images.shape[0]
    bf = 1.0 + jax.random.uniform(
        kb, (b, 1, 1, 1), minval=-brightness, maxval=brightness
    )
    cf = 1.0 + jax.random.uniform(
        kc, (b, 1, 1, 1), minval=-contrast, maxval=contrast
    )
    mean = jnp.mean(images, axis=(1, 2, 3), keepdims=True)
    return (images * bf - mean) * cf + mean


def random_erasing(
    rng: jax.Array,
    images: jnp.ndarray,
    scale: Tuple[float, float] = (0.02, 0.2),
    p: float = 0.5,
) -> jnp.ndarray:
    """Zero a random rectangle per image with probability `p` — the box
    is a mask over a static grid, never a dynamic shape."""
    b, h, w, _ = images.shape
    ka, ky, kx, kp = jax.random.split(rng, 4)
    area = jax.random.uniform(
        ka, (b,), minval=scale[0], maxval=scale[1]
    )
    side = jnp.sqrt(area)  # square boxes; h/w fractions
    bh = (side * h).astype(jnp.int32)
    bw = (side * w).astype(jnp.int32)
    y0 = (jax.random.uniform(ky, (b,)) * (h - bh)).astype(jnp.int32)
    x0 = (jax.random.uniform(kx, (b,)) * (w - bw)).astype(jnp.int32)
    yy = jnp.arange(h)[None, :, None]
    xx = jnp.arange(w)[None, None, :]
    inside = (
        (yy >= y0[:, None, None])
        & (yy < (y0 + bh)[:, None, None])
        & (xx >= x0[:, None, None])
        & (xx < (x0 + bw)[:, None, None])
    )
    apply = jax.random.bernoulli(kp, p, (b, 1, 1))
    return jnp.where((inside & apply)[..., None], 0.0, images)


def mixup(
    rng: jax.Array,
    images: jnp.ndarray,
    labels: jnp.ndarray,  # [B] int or [B, C] one-hot/soft
    num_classes: Optional[int] = None,
    alpha: float = 0.2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mixup (Zhang et al. 2018): convex-combine each image with a
    rolled partner; λ ~ Beta(α, α) per image.  Returns (mixed images,
    soft targets)."""
    kl, _ = jax.random.split(rng)
    b = images.shape[0]
    y = _one_hot(labels, num_classes)
    lam = jax.random.beta(kl, alpha, alpha, (b,))
    lam = jnp.maximum(lam, 1.0 - lam)  # keep the original dominant
    partner = jnp.roll(jnp.arange(b), 1)
    mixed = lam[:, None, None, None] * images + (
        1.0 - lam[:, None, None, None]
    ) * images[partner]
    targets = lam[:, None] * y + (1.0 - lam[:, None]) * y[partner]
    return mixed, targets


def cutmix(
    rng: jax.Array,
    images: jnp.ndarray,
    labels: jnp.ndarray,
    num_classes: Optional[int] = None,
    alpha: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CutMix (Yun et al. 2019): paste a λ-area rectangle from a rolled
    partner; targets mix by the *realized* box area (the clipped box can
    differ from λ)."""
    b, h, w, _ = images.shape
    kl, ky, kx = jax.random.split(rng, 3)
    y = _one_hot(labels, num_classes)
    lam = jax.random.beta(kl, alpha, alpha, (b,))
    cut = jnp.sqrt(1.0 - lam)
    bh = (cut * h).astype(jnp.int32)
    bw = (cut * w).astype(jnp.int32)
    cy = (jax.random.uniform(ky, (b,)) * h).astype(jnp.int32)
    cx = (jax.random.uniform(kx, (b,)) * w).astype(jnp.int32)
    y0 = jnp.clip(cy - bh // 2, 0, h)
    y1 = jnp.clip(cy + bh // 2, 0, h)
    x0 = jnp.clip(cx - bw // 2, 0, w)
    x1 = jnp.clip(cx + bw // 2, 0, w)
    yy = jnp.arange(h)[None, :, None]
    xx = jnp.arange(w)[None, None, :]
    inside = (
        (yy >= y0[:, None, None])
        & (yy < y1[:, None, None])
        & (xx >= x0[:, None, None])
        & (xx < x1[:, None, None])
    )  # [B, H, W]
    partner = jnp.roll(jnp.arange(b), 1)
    mixed = jnp.where(inside[..., None], images[partner], images)
    area = jnp.sum(inside, axis=(1, 2)).astype(jnp.float32) / (h * w)
    targets = (1.0 - area[:, None]) * y + area[:, None] * y[partner]
    return mixed, targets


def _one_hot(labels: jnp.ndarray, num_classes: Optional[int]):
    if labels.ndim == 1:
        if num_classes is None:
            raise ValueError("num_classes required for integer labels")
        return jax.nn.one_hot(labels, num_classes)
    return labels.astype(jnp.float32)
