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

                log_pdf, norm_demean, log_l, vmat = gaussian_low_rank_log_pdf(
                    search,
                    state["conditional_mean"],
                    state["conditional_covariance"],
                    log_shift,
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
                log_l_g = _gather_beam(full_b(log_l), w_idx)
                v_g = _gather_beam(full_b(vmat), w_idx)
                nd_g = _gather_beam(full_b(norm_demean), w_idx)
                joint_g = _gather_beam(full_b(joint), w_idx)

                # selected-slot artifacts
                log_l_sel = _gather_slot(log_l_g, r_idx)  # [B,beam,d]
                v_sel = _gather_slot(v_g, r_idx)  # [B,beam,d,d]
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
                h = v_sel * _datan_exp_h(log_l_sel)[..., None, :]  # [B,beam,d,d]
                cov_u = cov_u @ h[:, :, None]
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
