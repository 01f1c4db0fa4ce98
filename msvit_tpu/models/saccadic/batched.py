"""Batched lockstep saccade runner — the reference's commented "Batched
version" sketch (`modeling_scvitencoder.py:489-498`) realized as a fully
jittable `lax.scan`:

All images advance one glimpse per step in lockstep.  Per image, the
carry holds the current query, a fixed-capacity history of (query,
embedding) pairs, and a saccade-age counter.  Each step: embed the
glimpse → beam-match patterns against [new node ++ history] → take the
best one-wildcard (predictive) edge's conditional mean → decode the next
query.  An image whose query revisits its recent history (min distance
below threshold) or whose saccade hits max length *converges*: its next
query resets to the image center and its saccade age clears — the
lockstep analog of the serial controller's terminal/restart logic.

Compared to `SaccadicViTModel.forward` (the faithful serial controller),
this trades the queue/loop-closure bookkeeping for one static-shape jitted
program — the form you want for TPU throughput.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from msvit_tpu.models.saccadic.config import SaccadicViTConfig
from msvit_tpu.models.saccadic.embeddings import SaccadicViTEmbeddings
from msvit_tpu.models.saccadic.pattern import SaccadicViTMultiStatePattern

_SENTINEL = 1e6


def batched_saccade_run(
    config: SaccadicViTConfig,
    variables: Dict[str, Any],  # {"embeddings": ..., "pattern": ...}
    pixel_values: jnp.ndarray,  # [B, H, W, C]
    num_steps: int,
    max_saccade_length: int = 6,
    absolute_threshold: float = 0.1,
    convergence_distance: str = "spatial",
) -> Dict[str, jnp.ndarray]:
    """Returns a trace dict:
    queries [T, B, dof], embeddings [T, B, D], predicted [T, B, D],
    converged [T, B] (step ended that image's saccade),
    num_saccades [B]."""
    embeddings = SaccadicViTEmbeddings(config)
    pattern = SaccadicViTMultiStatePattern(config)
    b = pixel_values.shape[0]
    d = config.hidden_size
    dof = config.dof
    hist_cap = num_steps

    def step(carry, _):
        query, hist_q, hist_e, age, n_sacc = carry
        emb = embeddings.apply(
            variables["embeddings"], pixel_values, query
        ).astype(jnp.float32)  # [B, D]

        matches = pattern.apply(
            variables["pattern"], emb[:, None, :], hist_e, 1
        )
        # best one-wildcard edge across complexities → predicted embedding
        best_pdf = jnp.full((b,), -jnp.inf)
        predicted = jnp.zeros((b, d))
        for (_k, n_wild), p in matches.items():
            if n_wild != 1:
                continue
            pdf = p["joint_log_pdf"][:, 0]  # beams sorted desc
            cand = p["conditional_mean"][:, 0, 0]  # [B, D]
            take = pdf > best_pdf
            best_pdf = jnp.where(take, pdf, best_pdf)
            predicted = jnp.where(take[:, None], cand, predicted)

        next_query = embeddings.apply(
            variables["embeddings"],
            predicted,
            method=SaccadicViTEmbeddings.decode_position,
        )  # [B, dof]

        # convergence: revisit of the recent window, or saccade too long
        key_now = query if convergence_distance == "spatial" else emb
        window = hist_q if convergence_distance == "spatial" else hist_e
        dist = jnp.linalg.norm(window - key_now[:, None, :], axis=-1)
        step_idx = jnp.arange(hist_cap)[None, :]
        in_window = step_idx < jnp.minimum(age, hist_cap)[:, None]
        min_dist = jnp.min(
            jnp.where(in_window, dist, jnp.inf), axis=-1
        )
        converged = (min_dist < absolute_threshold) | (
            age + 1 >= max_saccade_length
        )

        # record into history ring (age indexes within the current saccade)
        slot = jnp.clip(age, 0, hist_cap - 1)
        hist_q = jax.vmap(
            lambda h, s, v: jax.lax.dynamic_update_index_in_dim(h, v, s, 0)
        )(hist_q, slot, query)
        hist_e = jax.vmap(
            lambda h, s, v: jax.lax.dynamic_update_index_in_dim(h, v, s, 0)
        )(hist_e, slot, emb)

        # converged images restart at the center with a fresh saccade
        center = jnp.zeros((b, dof))
        query_out = jnp.where(converged[:, None], center, next_query)
        age = jnp.where(converged, 0, age + 1)
        n_sacc = n_sacc + converged.astype(jnp.int32)

        out = {
            "queries": query,
            "embeddings": emb,
            "predicted": predicted,
            "converged": converged,
        }
        return (query_out, hist_q, hist_e, age, n_sacc), out

    init = (
        jnp.zeros((b, dof)),  # start at the image center (sample_initial)
        jnp.full((b, hist_cap, dof), _SENTINEL),
        jnp.full((b, hist_cap, d), _SENTINEL),
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b,), jnp.int32),
    )
    (q, hq, he, age, n_sacc), trace = jax.lax.scan(
        step, init, None, length=num_steps
    )
    trace["num_saccades"] = n_sacc
    return trace
