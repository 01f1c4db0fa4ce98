"""Exact t-SNE on device (debug/visualization clustering paths).

The reference embeds NCut eigenvectors in 2-D/3-D with sklearn's CPU
t-SNE for visual inspection of the spectral-clustering debug paths
(`model/clustering/modeling_spectral.py:12,291-292`).  Round 2 kept this
host-side like upstream; this module moves the whole computation
on-device as an exact (O(n²)) t-SNE whose every heavy term is a matmul:

* pairwise squared distances via the Gram trick (one [n,d]·[d,n] MXU
  matmul);
* per-row perplexity calibration as a **vectorized bisection over all
  rows at once** (`lax.fori_loop`, fixed iteration count — the
  doubling/halving bracket + bisect scheme sklearn's
  `_binary_search_perplexity` uses, run lock-step for every row);
* the Kullback–Leibler gradient loop as a `lax.scan` whose per-step
  cost is one [n,n] elementwise block plus two [n,n]·[n,dim] matmuls
  (attraction/repulsion), with sklearn's optimizer schedule — early
  exaggeration, momentum 0.5→0.8, per-parameter gain adaptation, and
  the `learning_rate="auto"` rule.

Parity: the joint-probability matrix is golden-tested against
`sklearn.manifold._t_sne._joint_probabilities` (`tests/test_tsne.py`);
the descent schedule follows sklearn's `_gradient_descent` defaults but
runs a fixed iteration count (no convergence early-exit — static shapes
under jit).  Exact mode only: debug-scale n (≤ a few thousand NCut
rows) fits the dense [n,n] path comfortably on one chip, where the MXU
makes it faster than host Barnes–Hut (measured in benchmarks/RESULTS.md).

n=784 (one image's patch tokens) through dim=8 NCut eigenvectors — the
reference's exact debug workload — runs in ~65 ms on-chip (500 iters)
vs ~1.2 s for host sklearn Barnes–Hut.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-12  # matches sklearn's MACHINE_EPSILON guard on P and Q


def _pairwise_sq_dists(x: jnp.ndarray) -> jnp.ndarray:
    """[n,d] → [n,n] squared euclidean distances (Gram trick, f32)."""
    x = x.astype(jnp.float32)
    sq = jnp.sum(x * x, axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    return jnp.maximum(d2, 0.0)


def conditional_probabilities(
    d2: jnp.ndarray,  # [n, n] squared distances
    perplexity: float,
    iters: int = 64,
) -> jnp.ndarray:
    """Row-stochastic P(j|i) with per-row entropy == log(perplexity).

    Lock-step bisection on the per-row precision beta: every row keeps
    (beta, lo, hi) and a finite-bracket flag; unbracketed rows double or
    halve (sklearn's scheme with ±inf brackets) — all rows advance each
    iteration, so the loop is a fixed-count `fori_loop` of [n,n] VPU
    work.  Distances are shifted by the per-row minimum before exp so
    large-scale data can't underflow the partition sum (the entropy and
    the normalized probabilities are shift-invariant).
    """
    n = d2.shape[0]
    target = jnp.log(jnp.float32(perplexity))
    eye = jnp.eye(n, dtype=bool)
    # Self-distances never participate; +inf keeps them out of min/exp.
    d2 = jnp.where(eye, jnp.inf, d2.astype(jnp.float32))
    shift = jnp.min(d2, axis=1, keepdims=True)  # finite: n >= 2
    ds = jnp.where(eye, jnp.inf, d2 - shift)  # [n,n], >= 0

    def entropy(beta):  # beta [n,1] -> (H [n], P [n,n] row-stochastic)
        p = jnp.exp(-ds * beta)  # exp(-inf)=0 kills the diagonal
        sum_p = jnp.maximum(jnp.sum(p, axis=1, keepdims=True), _EPS)
        p = p / sum_p
        # H = log Σp̃ + β·E_P[d²-shift]  (shift-invariant entropy in nats)
        h = jnp.log(sum_p[:, 0]) + beta[:, 0] * jnp.sum(
            jnp.where(eye, 0.0, ds * p), axis=1
        )
        return h, p

    def body(_, carry):
        beta, lo, hi = carry
        h, _ = entropy(beta)
        # entropy too high -> sharpen (raise beta); [n,1] to match beta
        too_high = h[:, None] > target
        new_lo = jnp.where(too_high, beta, lo)
        new_hi = jnp.where(too_high, hi, beta)
        up = jnp.where(jnp.isinf(hi), beta * 2.0, (beta + hi) * 0.5)
        down = jnp.where(lo == 0.0, beta * 0.5, (beta + lo) * 0.5)
        new_beta = jnp.where(too_high, up, down)
        return new_beta, new_lo, new_hi

    beta0 = jnp.ones((n, 1), jnp.float32)
    lo0 = jnp.zeros((n, 1), jnp.float32)  # beta > 0 always; 0 == unbracketed-below
    hi0 = jnp.full((n, 1), jnp.inf, jnp.float32)
    beta, _, _ = jax.lax.fori_loop(0, iters, body, (beta0, lo0, hi0))
    _, p = entropy(beta)
    return p


def joint_probabilities(
    x: jnp.ndarray, perplexity: float, iters: int = 64
) -> jnp.ndarray:
    """Symmetrized, globally-normalized P (sklearn `_joint_probabilities`)."""
    pc = conditional_probabilities(_pairwise_sq_dists(x), perplexity, iters)
    p = pc + pc.T
    p = p / jnp.maximum(jnp.sum(p), _EPS)
    return jnp.maximum(p, _EPS)


def _kl_and_grad(
    y: jnp.ndarray, p: jnp.ndarray, exaggeration: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """KL(P‖Q) and its gradient for the Student-t low-dim kernel.

    grad_i = 4 Σ_j (P̃_ij − Q_ij) q̃_ij (y_i − y_j) with q̃ the
    unnormalized kernel — expressed as a row-sum rescale plus one
    [n,n]·[n,dim] matmul (the classic W-trick), so the MXU carries it.
    """
    n = y.shape[0]
    d2 = _pairwise_sq_dists(y)
    qnum = 1.0 / (1.0 + d2)  # [n,n]
    qnum = qnum * (1.0 - jnp.eye(n, dtype=qnum.dtype))
    z = jnp.maximum(jnp.sum(qnum), _EPS)
    q = jnp.maximum(qnum / z, _EPS)
    w = (exaggeration * p - q) * qnum
    grad = 4.0 * (jnp.sum(w, axis=1, keepdims=True) * y - w @ y)
    kl = jnp.sum(p * (jnp.log(p) - jnp.log(q)))
    return kl, grad


@functools.partial(
    jax.jit, static_argnames=("n_iter", "exaggeration_iters")
)
def _tsne_optimize(
    p: jnp.ndarray,  # [n,n] joint probabilities
    y0: jnp.ndarray,  # [n,dim] init
    n_iter: int,
    exaggeration_iters: int,
    early_exaggeration: jnp.ndarray,
    learning_rate: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    def step(carry, it):
        y, vel, gains = carry
        exag = jnp.where(it < exaggeration_iters, early_exaggeration, 1.0)
        momentum = jnp.where(it < exaggeration_iters, 0.5, 0.8)
        kl, grad = _kl_and_grad(y, p, exag)
        same_dir = jnp.sign(grad) == jnp.sign(vel)
        gains = jnp.maximum(
            jnp.where(same_dir, gains * 0.8, gains + 0.2), 0.01
        )
        vel = momentum * vel - learning_rate * gains * grad
        y = y + vel
        return (y, vel, gains), kl

    zeros = jnp.zeros_like(y0)
    (y, _, _), kls = jax.lax.scan(
        step, (y0, zeros, jnp.ones_like(y0)), jnp.arange(n_iter)
    )
    return y, kls


def tsne(
    x: jnp.ndarray,  # [n, d]
    dim: int = 2,
    perplexity: float = 30.0,
    n_iter: int = 500,
    early_exaggeration: float = 12.0,
    exaggeration_iters: int = 250,
    learning_rate: Optional[float] = None,  # None == sklearn "auto"
    init: str = "pca",  # "pca" (deterministic) | "random"
    key: Optional[jax.Array] = None,
    calibration_iters: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Embed [n,d] → [n,dim]; returns (embedding, per-iteration KL).

    Drop-in for the reference's `TSNE(n_components=dim).fit_transform`
    debug calls, on device.  PCA init (sklearn's default) makes the
    output deterministic; pass init="random" with a key for the classic
    1e-4-scaled Gaussian start.
    """
    n = x.shape[0]
    if n < 4:
        raise ValueError(f"t-SNE needs n >= 4, got {n}")
    # sklearn requires perplexity < n; the effective neighborhood also
    # needs 3·perplexity neighbors — clamp rather than error (debug path).
    perplexity = min(float(perplexity), (n - 1) / 3.0)

    p = joint_probabilities(x, perplexity, calibration_iters)

    if init == "pca":
        from msvit_tpu.ops.linalg import pca_lowrank

        _, _, v = pca_lowrank(x.astype(jnp.float32), q=dim)
        y0 = (x.astype(jnp.float32) - jnp.mean(x, axis=0)) @ v[:, :dim]
        std0 = jnp.maximum(jnp.std(y0[:, 0]), _EPS)
        y0 = y0 / std0 * 1e-4  # sklearn's PCA-init scaling
    elif init == "random":
        if key is None:
            raise ValueError('init="random" needs an explicit PRNG key')
        y0 = 1e-4 * jax.random.normal(key, (n, dim), jnp.float32)
    else:
        raise ValueError(f"unknown init {init!r}")

    if learning_rate is None:
        learning_rate = max(n / early_exaggeration / 4.0, 50.0)

    return _tsne_optimize(
        p,
        y0,
        n_iter=n_iter,
        exaggeration_iters=exaggeration_iters,
        early_exaggeration=jnp.float32(early_exaggeration),
        learning_rate=jnp.float32(learning_rate),
    )
