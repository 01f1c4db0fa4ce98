"""Unit tests for the math helpers (reference `infrastructure/utils.py:139-260`)."""

import numpy as np
import jax
import jax.numpy as jnp

from msvit_tpu.utils import (
    batch_trace,
    gaussian_kl,
    inverse_cubic,
    multiclass_logits,
    pow_series,
    sqrtm,
)


def test_pow_series_matches_naive():
    rng = np.random.default_rng(0)
    m = jnp.asarray(rng.standard_normal((4, 4)) * 0.3, dtype=jnp.float32)
    for n in (1, 2, 3, 5, 8):
        got = pow_series(m, n)
        want = jnp.stack(
            [jnp.linalg.matrix_power(m, k) for k in range(n)]
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_batch_trace():
    x = jnp.arange(24, dtype=jnp.float32).reshape(2, 3, 4)[:, :3, :3]
    got = batch_trace(x)
    want = jnp.stack([jnp.trace(x[0]), jnp.trace(x[1])])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_gaussian_kl_identity_is_zero():
    cov = jnp.eye(3) * 2.0
    np.testing.assert_allclose(float(gaussian_kl(cov, cov)), 0.0, atol=1e-6)


def test_gaussian_kl_formula():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((3, 3)).astype(np.float32)
    b = rng.standard_normal((3, 3)).astype(np.float32)
    cov1 = jnp.asarray(a @ a.T + 3 * np.eye(3, dtype=np.float32))
    cov2 = jnp.asarray(b @ b.T + 3 * np.eye(3, dtype=np.float32))
    want = (
        np.log(np.linalg.det(np.asarray(cov2)) / np.linalg.det(np.asarray(cov1)))
        - 3
        + np.trace(np.linalg.inv(np.asarray(cov2)) @ np.asarray(cov1))
    ) / 2
    np.testing.assert_allclose(float(gaussian_kl(cov1, cov2)), want, rtol=1e-4)


def test_sqrtm():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((4, 4)).astype(np.float32)
    psd = jnp.asarray(a @ a.T + np.eye(4, dtype=np.float32))
    root = sqrtm(psd)
    np.testing.assert_allclose(np.asarray(root @ root), np.asarray(psd), atol=1e-4)


def test_multiclass_logits_centered():
    t = jnp.asarray([[0.2, 0.3, 0.5]])
    logits = multiclass_logits(t)
    np.testing.assert_allclose(float(jnp.sum(logits)), 0.0, atol=1e-6)
    # differences of logits = differences of log probs
    np.testing.assert_allclose(
        float(logits[0, 2] - logits[0, 0]), float(np.log(0.5 / 0.2)), rtol=1e-5
    )


def test_inverse_cubic_inverts_y3_plus_y():
    """forward(t) solves y³ + y = t (closed-form depressed cubic,
    reference `utils.py:238-260`); backward is 1/(r²+1)."""
    y = jnp.linspace(-3.0, 3.0, 11)
    t = y**3 + y
    got = inverse_cubic(t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(y), atol=1e-3)

    # gradient: dy/dt = 1/(3y²+1); reference backward uses 1/(r²+1) with
    # r = √3·y, i.e. the same quantity.
    g = jax.grad(lambda s: inverse_cubic(s))(jnp.asarray(2.0))
    y0 = float(inverse_cubic(jnp.asarray(2.0)))
    np.testing.assert_allclose(float(g), 1.0 / (3 * y0**2 + 1), rtol=1e-4)
