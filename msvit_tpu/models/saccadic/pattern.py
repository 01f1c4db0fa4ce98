"""Learned Gaussian-mixture "patterns" and the wildcard-stratified beam
search matcher — the most intricate finished piece of the reference
(`predictor/modeling_predictor.py:54-212`; design notes `design.txt:28-58`).

A pattern of complexity K is a joint Gaussian over K slot embeddings with
per-slot low-rank-plus-isotropic covariance (shift·I + A Aᵀ, A [D, d])
whose slots share the d-dimensional factor space.  `match` greedily binds
tokens to slots: each beam step scores every (beam entry, unfilled slot,
candidate token) triple by Gaussian log-pdf — computed through the SVD of
the low-rank factor (reference `:128-146`) — takes a global top-`beam_size`
(reference `:107-112,152`), and performs the exact Gaussian conditioning
update of the remaining slots (rank-d adapter H = V·(1+λ̃)^{-1/2},
reference `:171-190`).

TPU-first: the reference's `while beam` with dynamically keyed dicts
becomes a static double loop (complexities × slots) — a pattern of
complexity K runs exactly K binding steps, so every shape is known at
trace time.  The first step searches only `hidden_states`, guaranteeing
each match binds at least one new node (reference `:121-126`).

One deliberate deviation: top-k selection uses `lax.top_k` (sorted by
score) while the reference enumerates `pdf >= kth-value` in row-major
order (`:107-112`) — same selected set, different intra-beam order, and
robust to ties.

Decomposition: the default solver replaces the reference's per-covariance
SVD (and this module's r2 Gram-eigh equivalent) with a Cholesky–Woodbury
factorization of I + G (G the d×d Gram of the scaled factor) — see
`gaussian_low_rank_log_pdf_chol`.  On TPU the batched d×d eigendecomposition
is an iterative QDWH solve and dominated the matcher; Cholesky + one
triangular solve are direct O(d³) ops.  The two routes agree exactly on
log-pdfs, selections, and conditional means; their covariance factors
differ by a per-slot rotation that no consumer can observe.
`SaccadicViTConfig.matcher_solver` selects ("chol" default, "eigh" kept
for the parity test).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from msvit_tpu.models.saccadic.config import SaccadicViTConfig

WILDCARD = -1


def _datan_exp_h(t: jnp.ndarray) -> jnp.ndarray:
    """rsqrt(1 + exp(t)) (reference `:104-105`)."""
    return jax.lax.rsqrt(1.0 + jnp.exp(t))


def gaussian_low_rank_log_pdf(
    search: jnp.ndarray,  # [B, M, D]
    mean: jnp.ndarray,  # [B, W, R, D]
    cov: jnp.ndarray,  # [B, W, R, D, d]
    log_shift: jnp.ndarray,  # scalar
):
    """log N(x; μ, shift·I + A Aᵀ) for every (beam, slot, token) triple,
    plus the SVD artifacts the conditioning update needs
    (reference `:128-146`).  Returns (log_pdf [B,W,R,M],
    norm_demean [B,W,R,M,d], log_l [B,W,R,d], v [B,W,R,d,d])."""
    d_model = search.shape[-1]
    demean = (
        search[:, None, None, :, :] - mean[..., None, :]
    )  # [B, W, R, M, D]
    scaled = demean * jnp.exp(-0.5 * log_shift)

    # thin SVD of the [D, d] factor via eigh of its d×d Gram matrix —
    # (U, S, V) with A = U S Vᵀ, but the eigensolve is d×d (d=64) instead
    # of an iterative D×d SVD; ~10× faster on TPU for the matcher's
    # thousands of per-(beam, slot) covariances
    gram = jnp.einsum("...di,...dj->...ij", cov, cov)  # [B,W,R,d,d]
    w, v = jnp.linalg.eigh(gram)  # ascending
    w = w[..., ::-1]
    v = v[..., ::-1]
    s = jnp.sqrt(jnp.maximum(w, 0.0))
    s_inv = jnp.where(s > 1e-10, 1.0 / jnp.maximum(s, 1e-10), 0.0)
    u = cov @ (v * s_inv[..., None, :])  # [B,W,R,D,d]
    vt = jnp.swapaxes(v, -1, -2)
    log_l = 2.0 * jnp.log(jnp.maximum(s, 1e-20)) - log_shift  # [B,W,R,d]
    norm_u = u * _datan_exp_h(-log_l)[..., None, :]  # [B,W,R,D,d]
    norm_demean = scaled @ norm_u  # [B,W,R,M,d]

    constant = -0.5 * d_model * math.log(2.0 * math.pi)
    determinant = -0.5 * (
        d_model * log_shift + jnp.sum(jnp.log1p(jnp.exp(log_l)), axis=-1)
    )  # [B,W,R]
    exponent = -0.5 * (
        jnp.sum(scaled**2, axis=-1) - jnp.sum(norm_demean**2, axis=-1)
    )  # [B,W,R,M]
    log_pdf = constant + determinant[..., None] + exponent
    v = jnp.swapaxes(vt, -1, -2)
    return log_pdf, norm_demean, log_l, v


def gaussian_low_rank_log_pdf_chol(
    search: jnp.ndarray,  # [B, M, D]
    mean: jnp.ndarray,  # [B, W, R, D]
    cov: jnp.ndarray,  # [B, W, R, D, d]
    log_shift: jnp.ndarray,  # scalar
):
    """Cholesky–Woodbury route to the same density — the TPU fast path.

    With Σ = σ·I + A Aᵀ, B = A/√σ, G = BᵀB and I + G = L Lᵀ (always SPD,
    ≥ I, so the Cholesky never needs regularization):

        log det Σ        = D·logσ + 2·Σᵢ log Lᵢᵢ
        (x−μ)ᵀ Σ⁻¹ (x−μ) = ‖y‖² − ‖yᵀ B L⁻ᵀ‖²,   y = (x−μ)/√σ
        conditioning adapter h = L⁻ᵀ  (h hᵀ = (I+G)⁻¹)

    The eigh route's (norm_demean, h) pair differs from this one by a
    right-rotation of the d-dim factor basis that cancels in every
    consumer: log_pdf and the conditional mean are bit-comparable, the
    conditional covariance factor A·h only ever enters through A h hᵀ Aᵀ
    (next-iteration Gram, noise sampling), which is rotation-invariant.
    Replaces the batched iterative QDWH eigensolver with one direct
    Cholesky + triangular solve per (beam, slot) — all O(d³) direct ops.

    Returns (log_pdf [B,W,R,M], norm_demean [B,W,R,M,d], h [B,W,R,d,d]).
    """
    d_model = search.shape[-1]
    d = cov.shape[-1]
    demean = (
        search[:, None, None, :, :] - mean[..., None, :]
    )  # [B, W, R, M, D]
    inv_sqrt_shift = jnp.exp(-0.5 * log_shift)
    scaled = demean * inv_sqrt_shift
    bmat = cov * inv_sqrt_shift  # [B,W,R,D,d]
    gram = jnp.einsum("...di,...dj->...ij", bmat, bmat)  # G = BᵀB
    eye = jnp.eye(d, dtype=gram.dtype)
    chol = jnp.linalg.cholesky(gram + eye)  # L: L Lᵀ = I + G
    h = jax.lax.linalg.triangular_solve(
        chol,
        jnp.broadcast_to(eye, chol.shape),
        left_side=True,
        lower=True,
        transpose_a=True,
    )  # L⁻ᵀ
    norm_demean = (scaled @ bmat) @ h  # yᵀ B L⁻ᵀ  [B,W,R,M,d]

    constant = -0.5 * d_model * math.log(2.0 * math.pi)
    logdet_i_g = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1
    )  # [B,W,R]
    determinant = -0.5 * (d_model * log_shift + logdet_i_g)
    exponent = -0.5 * (
        jnp.sum(scaled**2, axis=-1) - jnp.sum(norm_demean**2, axis=-1)
    )
    log_pdf = constant + determinant[..., None] + exponent
    return log_pdf, norm_demean, h


def _matcher_solve(search, mean, cov, log_shift, solver: str):
    """Dispatch to a decomposition; both return (log_pdf, norm_demean, h)
    with h the conditioning adapter satisfying h hᵀ = (I+G)⁻¹."""
    if solver == "chol":
        return gaussian_low_rank_log_pdf_chol(search, mean, cov, log_shift)
    if solver == "eigh":
        log_pdf, norm_demean, log_l, v = gaussian_low_rank_log_pdf(
            search, mean, cov, log_shift
        )
        h = v * _datan_exp_h(log_l)[..., None, :]  # V·(1+λ)^{-1/2}
        return log_pdf, norm_demean, h
    raise ValueError(f"unknown matcher_solver {solver!r}")


def _gather_beam(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather along axis 1: arr [B, W, ...], idx [B, beam] → [B, beam, ...]."""
    expanded = idx.reshape(idx.shape + (1,) * (arr.ndim - 2))
    return jnp.take_along_axis(arr, expanded, axis=1)


def _gather_slot(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather along axis 2: arr [B, beam, R, ...], idx [B, beam] →
    [B, beam, ...]."""
    expanded = idx.reshape(idx.shape + (1,) * (arr.ndim - 2))
    return jnp.take_along_axis(arr, expanded, axis=2)[:, :, 0]


class SaccadicViTMultiStatePattern(nn.Module):
    """Pattern bank + beam-search matcher."""

    config: SaccadicViTConfig

    def setup(self):
        cfg = self.config
        init = nn.initializers.normal(1.0)
        self.means = {
            k: self.param(f"mean_{k}", init, (v, k, cfg.hidden_size))
            for k, v in cfg.num_patterns
        }
        self.stds = {
            k: self.param(
                f"std_{k}", init, (v, k, cfg.hidden_size, cfg.covariance_dim)
            )
            for k, v in cfg.num_patterns
        }
        self.log_covariance_shift = self.param(
            "log_covariance_shift",
            nn.initializers.constant(cfg.log_covariance_shift),
            (),
        )

    def __call__(self, hidden_states, context_states, max_wildcards: int = 0):
        return self.match(hidden_states, context_states, max_wildcards)

    def match(
        self,
        hidden_states: jnp.ndarray,  # [B, N, D]
        context_states: jnp.ndarray,  # [B, C, D]
        max_wildcards: int = 0,
    ) -> Dict[Tuple[int, int], Dict[str, jnp.ndarray]]:
        """Returns {(complexity, n_wildcards): {pattern_index [B,W],
        node_indices [B,W,K] (−1 = wildcard; indices < N are hidden nodes,
        ≥ N index context), joint_log_pdf [B,W],
        conditional_mean [B,W,n_wild,D],
        conditional_covariance [B,W,n_wild,D,d]}}."""
        cfg = self.config
        b, n, d_model = hidden_states.shape
        d = cfg.covariance_dim
        log_shift = self.log_covariance_shift
        full_search = jnp.concatenate(
            [hidden_states, context_states], axis=1
        ).astype(jnp.float32)
        hidden_f32 = hidden_states.astype(jnp.float32)

        output: Dict[Tuple[int, int], Dict[str, jnp.ndarray]] = {}

        for k, v in cfg.num_patterns:
            # initial beam: all v patterns, all slots wildcards (`:91-102`)
            # mean/cov start with batch dim 1: the initial bank is shared
            # across the batch, so the first iteration's eigendecompositions
            # run once per pattern instead of once per (batch, pattern)
            state = {
                "pattern_index": jnp.broadcast_to(jnp.arange(v), (b, v)),
                "node_indices": jnp.full((b, v, k), WILDCARD, jnp.int32),
                "joint_log_pdf": jnp.zeros((b, v)),
                "conditional_mean": self.means[k][None].astype(jnp.float32),
                "conditional_covariance": self.stds[k][None].astype(
                    jnp.float32
                ),
            }

            for it in range(k):
                r = k - it  # slots remaining
                w = state["pattern_index"].shape[1]
                # first step searches hidden only (`:121-126`)
                search = hidden_f32 if (it == 0 and n > 0) else full_search
                m = search.shape[1]
                beam = min(cfg.beam_size, w * r * m)

                log_pdf, norm_demean, hmat = _matcher_solve(
                    search,
                    state["conditional_mean"],
                    state["conditional_covariance"],
                    log_shift,
                    cfg.matcher_solver,
                )
                joint = state["joint_log_pdf"][:, :, None, None] + log_pdf

                _, flat_idx = jax.lax.top_k(joint.reshape(b, -1), beam)
                w_idx = (flat_idx // (r * m)).astype(jnp.int32)
                rem = flat_idx % (r * m)
                r_idx = (rem // m).astype(jnp.int32)
                m_idx = (rem % m).astype(jnp.int32)

                # gather beam entries (broadcast batch-1 tensors first)
                def full_b(arr):
                    return jnp.broadcast_to(arr, (b,) + arr.shape[1:])

                pattern_index = jnp.take_along_axis(
                    state["pattern_index"], w_idx, axis=1
                )
                nodes = _gather_beam(state["node_indices"], w_idx)
                mean_g = _gather_beam(full_b(state["conditional_mean"]), w_idx)
                cov_g = _gather_beam(
                    full_b(state["conditional_covariance"]), w_idx
                )
                h_g = _gather_beam(full_b(hmat), w_idx)
                nd_g = _gather_beam(full_b(norm_demean), w_idx)
                joint_g = _gather_beam(full_b(joint), w_idx)

                # selected-slot artifacts
                h_sel = _gather_slot(h_g, r_idx)  # [B,beam,d,d]
                nd_sel = _gather_slot(nd_g, r_idx)  # [B,beam,M,d]
                nd_sel = jnp.take_along_axis(
                    nd_sel, m_idx[:, :, None, None], axis=2
                )[:, :, 0]  # [B,beam,d]
                pdf_sel = _gather_slot(joint_g, r_idx)  # [B,beam,M]
                joint_new = jnp.take_along_axis(
                    pdf_sel, m_idx[:, :, None], axis=2
                )[:, :, 0]

                # bind the selected slot: the r_idx-th *wildcard* position
                # (reference `:159-165`)
                wildcard_pos = jnp.argsort(
                    nodes != WILDCARD, axis=-1, stable=True
                )[..., :r]  # [B,beam,r] — wildcard slots in order
                sel_pos = jnp.take_along_axis(
                    wildcard_pos, r_idx[:, :, None], axis=-1
                )[..., 0]  # [B,beam]
                nodes_new = jnp.where(
                    jnp.arange(k)[None, None, :] == sel_pos[:, :, None],
                    m_idx[:, :, None],
                    nodes,
                )

                # Gaussian conditioning of the unselected slots (`:171-190`)
                unsel = jnp.argsort(
                    jnp.arange(r)[None, None, :] == r_idx[:, :, None],
                    axis=-1,
                    stable=True,
                )[..., : r - 1]  # [B,beam,r-1]
                mean_u = jnp.take_along_axis(
                    mean_g, unsel[..., None], axis=2
                )
                cov_u = jnp.take_along_axis(
                    cov_g, unsel[..., None, None], axis=2
                )
                cov_u = cov_u @ h_sel[:, :, None]
                mean_u = mean_u + (cov_u @ nd_sel[:, :, None, :, None])[..., 0]

                state = {
                    "pattern_index": pattern_index,
                    "node_indices": nodes_new,
                    "joint_log_pdf": joint_new,
                    "conditional_mean": mean_u,
                    "conditional_covariance": cov_u,
                }
                n_remaining = r - 1
                if n_remaining <= max_wildcards:
                    output[(k, n_remaining)] = dict(state)

        return output
