"""Small linear-algebra helpers (reference consumes `torch.pca_lowrank`,
`torch.linalg.pinv`, `torch.svd` — SURVEY §2.9)."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def pca_lowrank(
    x: jnp.ndarray, q: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Centered rank-q PCA of x [n, d]: returns (U [n,q], S [q], V [d,q])
    with x_centered ≈ U diag(S) Vᵀ — the `torch.pca_lowrank` contract.
    Computed via eigh of the d×d (or n×n) Gram matrix: exact, TPU-friendly
    for the small d used here (no randomized sketch needed)."""
    x = x.astype(jnp.float32)
    xc = x - jnp.mean(x, axis=0, keepdims=True)
    n, d = xc.shape
    if d <= n:
        w, v = jnp.linalg.eigh(xc.T @ xc)  # ascending
        v = v[:, ::-1][:, :q]  # [d, q]
        s = jnp.sqrt(jnp.maximum(w[::-1][:q], 0.0))
        u = (xc @ v) / jnp.maximum(s, 1e-8)[None, :]
    else:
        w, u_full = jnp.linalg.eigh(xc @ xc.T)
        u = u_full[:, ::-1][:, :q]
        s = jnp.sqrt(jnp.maximum(w[::-1][:q], 0.0))
        v = (xc.T @ u) / jnp.maximum(s, 1e-8)[None, :]
    return u, s, v
