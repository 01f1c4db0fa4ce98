"""Math helpers — JAX equivalents of the reference's computation utilities
(`infrastructure/utils.py:139-260`), written against XLA semantics:
static shapes, `vmap`-friendly batching, and custom VJPs where the
reference used a custom autograd Function.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def ceildiv(a: int, b: int) -> int:
    """Ceiling division (reference `utils.py:176-177`)."""
    return -(-a // b)


def pow_series(m: jnp.ndarray, n: int) -> jnp.ndarray:
    """Stack of matrix powers ``[I, M, M², …, M^(n-1)]`` of shape [n, N, N].

    Same output as reference `utils.py:139-155` but computed with a simple
    doubling scheme expressed as dense batched matmuls (MXU-friendly):
    powers[2k:2k+k] = powers[:k] @ M^k.
    """
    N = m.shape[-1]
    eye = jnp.eye(N, dtype=m.dtype)
    if n == 1:
        return eye[None]
    k = int(math.ceil(math.log2(n)))
    out = jnp.stack([eye, m])
    block = m
    for _ in range(k - 1):
        block = block @ block
        out = jnp.concatenate([out, out @ block], axis=0)
    return out[:n]


def batch_trace(x: jnp.ndarray) -> jnp.ndarray:
    """Trace over the last two dims (reference `utils.py:158-159`)."""
    return jnp.trace(x, axis1=-2, axis2=-1)


def gaussian_kl(cov1: jnp.ndarray, cov2: jnp.ndarray) -> jnp.ndarray:
    """KL(N(0, cov1) ‖ N(0, cov2)) for equal means.

    Matches reference `kl_div` (`utils.py:162-163`):
    (log det(cov2)/det(cov1) − d + tr(cov2⁻¹ cov1)) / 2, with the trace
    computed as an elementwise product sum (cov are symmetric).
    """
    d = cov1.shape[-1]
    _, logdet1 = jnp.linalg.slogdet(cov1)
    _, logdet2 = jnp.linalg.slogdet(cov2)
    trace_term = jnp.sum(jnp.linalg.inv(cov2) * cov1, axis=(-2, -1))
    return (logdet2 - logdet1 - d + trace_term) / 2


def sqrtm(t: jnp.ndarray) -> jnp.ndarray:
    """Principal matrix square root via symmetric eigendecomposition.

    The reference (`utils.py:166-168`) uses a general complex eig; its only
    use sites are symmetric PSD matrices (covariances), where `eigh` is both
    faster and TPU-supported.  Eigenvalues are clamped at 0 to stay real.
    """
    w, v = jnp.linalg.eigh(t)
    w = jnp.sqrt(jnp.clip(w, 0.0, None))
    return (v * w[..., None, :]) @ jnp.swapaxes(v, -1, -2)


def multiclass_logits(t: jnp.ndarray) -> jnp.ndarray:
    """Centered log (reference `utils.py:184-186`)."""
    logits = jnp.log(t)
    return logits - jnp.mean(logits, axis=-1, keepdims=True)


def _mnpq(x_mn, y_pq):
    """Outer broadcast [..., m, n] x [..., p, q] -> [..., m, n, p, q]."""
    return x_mn[..., :, :, None, None] * y_pq[..., None, None, :, :]


def hadamard_conjugation(a, b, alpha, beta, c):
    """Σ_{m,p} A[m,n] B[p,q] C[m,p] / (1 − α[m,n] β[p,q]) → [..., n, q].

    Geometric series Σ_k (α∘)^k A^T C B (β∘)^k summed in closed form —
    the reference's analysis utility (`utils.py:189-198`), re-derived
    here as a single einsum contraction over an explicit [m,n,p,q]
    coefficient tensor (the coefficient couples all four indices, so the
    rank-4 intermediate is intrinsic to the dense formulation).
    """
    coeff = 1.0 / (1.0 - _mnpq(alpha, beta))
    return jnp.einsum("...mn,...pq,...mp,...mnpq->...nq", a, b, c, coeff)


def hadamard_conjugation_diff_order1(a, b, alpha, beta1, beta2, c):
    """Difference quotient of `hadamard_conjugation` in β: closed form of
    Σ over the α/(1−αβ₁)(1−αβ₂) kernel (reference `utils.py:201-213`)."""
    coeff = alpha[..., :, :, None, None] / (
        (1.0 - _mnpq(alpha, beta1)) * (1.0 - _mnpq(alpha, beta2))
    )
    return jnp.einsum("...mn,...pq,...mp,...mnpq->...nq", a, b, c, coeff)


def hadamard_conjugation_diff_order2(b, beta1, beta2, c):
    """Second-order difference variant (reference `utils.py:216-235`):
    kernel (1 − β₁₂β₂₁) / (1−β₁β₁')(1−β₁₂)(1−β₂₁)(1−β₂β₂') where
    β₁₂[m,n,p,q] = β₁[m,n]β₂[p,q] and β₂₁ is its (m↔p, n↔q) transpose."""
    beta12 = _mnpq(beta1, beta2)
    beta21 = _mnpq(beta2, beta1)
    coeff = (1.0 - beta12 * beta21) / (
        (1.0 - _mnpq(beta1, beta1))
        * (1.0 - beta12)
        * (1.0 - beta21)
        * (1.0 - _mnpq(beta2, beta2))
    )
    return jnp.einsum("...mn,...pq,...mp,...mnpq->...nq", b, b, c, coeff)


@jax.custom_vjp
def inverse_cubic(t: jnp.ndarray) -> jnp.ndarray:
    """Inverse of x ↦ (3√3/2)·(x³/3 + x)/√3 — the reference's `InverseCubic`
    op (`utils.py:238-260`): forward solves the depressed cubic in closed
    form; backward is 1/(r² + 1) (custom VJP, as upstream).
    """
    return _inverse_cubic_fwd(t)[0]


def _inverse_cubic_r(t):
    c = t * 2.598076211353
    k = jnp.cbrt(jnp.sqrt(jnp.square(c) + 1.0) + c)
    return k - 1.0 / k


def _inverse_cubic_fwd(t):
    r = _inverse_cubic_r(t)
    return 0.577350269190 * r, r


def _inverse_cubic_bwd(r, g):
    return (g / (jnp.square(r) + 1.0),)


inverse_cubic.defvjp(_inverse_cubic_fwd, _inverse_cubic_bwd)
