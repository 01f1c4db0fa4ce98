"""On-device augmentations (data/augment.py): soft-target mass
conservation, realized-area label mixing for cutmix, mask geometry,
determinism, and jittability."""

import numpy as np

import jax
import jax.numpy as jnp

from msvit_tpu.data.augment import (
    cutmix,
    mixup,
    random_brightness_contrast,
    random_erasing,
    random_flip,
)


def _batch(b=4, h=16, w=16):
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (b, h, w, 3))
    labels = jnp.arange(b) % 3
    return images, labels


def test_mixup_targets_and_convexity():
    images, labels = _batch()
    mixed, targets = jax.jit(
        lambda r, x, y: mixup(r, x, y, num_classes=3)
    )(jax.random.PRNGKey(1), images, labels)
    assert mixed.shape == images.shape
    np.testing.assert_allclose(np.asarray(targets.sum(-1)), 1.0, rtol=1e-6)
    # mixed pixels are within the convex hull of the two sources
    partner = np.roll(np.arange(4), 1)
    lo = np.minimum(np.asarray(images), np.asarray(images)[partner])
    hi = np.maximum(np.asarray(images), np.asarray(images)[partner])
    m = np.asarray(mixed)
    assert (m >= lo - 1e-6).all() and (m <= hi + 1e-6).all()


def test_cutmix_realized_area_matches_targets():
    images, labels = _batch(b=6, h=32, w=32)
    mixed, targets = jax.jit(
        lambda r, x, y: cutmix(r, x, y, num_classes=3)
    )(jax.random.PRNGKey(2), images, labels)
    # pixels outside the box equal the original; the partner-mass in the
    # target equals the realized pasted fraction
    partner = np.roll(np.arange(6), 1)
    img, mix = np.asarray(images), np.asarray(mixed)
    for i in range(6):
        pasted = (mix[i] != img[i]).any(-1)
        frac = pasted.mean()
        y = np.asarray(targets[i])
        own, other = labels[i], labels[partner[i]]
        if own == other:
            continue
        np.testing.assert_allclose(y[other], frac, atol=1e-3)
        np.testing.assert_allclose(y[own], 1.0 - frac, atol=1e-3)


def test_random_erasing_zeroes_a_box_only():
    images, _ = _batch()
    out = jax.jit(lambda r, x: random_erasing(r, x, p=1.0))(
        jax.random.PRNGKey(3), images
    )
    img, o = np.asarray(images), np.asarray(out)
    for i in range(img.shape[0]):
        changed = (o[i] != img[i]).any(-1)
        assert changed.any()  # p=1: some box erased
        assert (o[i][changed] == 0).all()  # erased pixels are zero
        ys, xs = np.where(changed)
        # the changed set is exactly a filled rectangle
        assert changed[ys.min() : ys.max() + 1, xs.min() : xs.max() + 1].all()


def test_flip_and_jitter_deterministic():
    images, _ = _batch()
    r = jax.random.PRNGKey(4)
    a = random_flip(r, images)
    b = random_flip(r, images)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # each image is either original or exactly flipped
    for i in range(images.shape[0]):
        ai = np.asarray(a[i])
        assert (ai == np.asarray(images[i])).all() or (
            ai == np.asarray(images[i][:, ::-1])
        ).all()
    j1 = random_brightness_contrast(r, images)
    j2 = random_brightness_contrast(r, images)
    np.testing.assert_array_equal(np.asarray(j1), np.asarray(j2))
    assert not np.array_equal(np.asarray(j1), np.asarray(images))
