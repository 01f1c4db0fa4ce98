"""Saccadic losses — the three objectives named in the reference's design
notes (`design.txt:1-8`: predictive, positional recovery, preservation).
Upstream never implemented any training code for this family; these are
the TPU-native realizations:

* differentiable batch objectives (jittable, for training the pattern
  bank and refiner on pools of glimpse embeddings):
  - `pattern_nll_loss` — fit the Gaussian-mixture patterns by maximizing
    the best-match joint log-pdf of fully-bound (zero-wildcard) matches;
  - `refiner_preservation_loss` — the sketch's preservation error
    (`modeling_scvitencoder.py:478-479`): refined embeddings of matched
    nodes should preserve the inputs;
* `trace_losses` — host-side diagnostics over a serial controller trace
  (predictive: predicted vs realized embedding; positional recovery:
  decoded query vs issued query; preservation: refined vs raw embedding).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from msvit_tpu.models.saccadic.pattern import SaccadicViTMultiStatePattern
from msvit_tpu.models.saccadic.refiner import TransformerSaccadicViTPredictor


def pattern_nll_loss(
    pattern: SaccadicViTMultiStatePattern,
    variables: Any,
    hidden_states: jnp.ndarray,  # [B, N, D]
    context_states: jnp.ndarray,  # [B, C, D]
) -> jnp.ndarray:
    """−E[max joint log-pdf] over the fully-bound matches of every
    complexity — differentiable through the beam search's pdf terms
    (the discrete top-k indices act as a hard assignment)."""
    matches = pattern.apply(variables, hidden_states, context_states, 0)
    nll = 0.0
    count = 0
    for (_k, n_wild), p in matches.items():
        if n_wild != 0:
            continue
        nll = nll - jnp.mean(p["joint_log_pdf"][:, 0])  # best entry per batch
        count += 1
    return nll / max(count, 1)


def refiner_preservation_loss(
    pattern: SaccadicViTMultiStatePattern,
    predictor: TransformerSaccadicViTPredictor,
    pattern_vars: Any,
    predictor_vars: Any,
    hidden_states: jnp.ndarray,
    context_states: jnp.ndarray,
    max_wildcards: int = 1,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Refined node embeddings ≈ inputs (squared error averaged over
    hidden nodes), plus the match NLL as aux."""
    matches = pattern.apply(
        pattern_vars, hidden_states, context_states, max_wildcards
    )
    refined, _ = predictor.apply(
        predictor_vars, hidden_states, context_states, matches
    )
    err = jnp.mean(
        jnp.sum(
            (refined.astype(jnp.float32) - hidden_states.astype(jnp.float32))
            ** 2,
            axis=-1,
        )
    )
    aux = {
        "best_joint_log_pdf": jnp.mean(
            jnp.stack(
                [p["joint_log_pdf"][:, 0] for p in matches.values()]
            )
        )
    }
    return err, aux


def trace_losses(
    trace: Dict[str, np.ndarray],
    variables: Any,
    embeddings_module,
) -> Dict[str, float]:
    """Diagnostics over a `SaccadicViTModel.forward` trace (host-side;
    the serial loop is not differentiated — design.txt's loss list)."""
    emb = np.asarray(trace["embedding"], np.float32)
    pred = np.asarray(trace["predicted_embedding"], np.float32)
    query = np.asarray(trace["query"], np.float32)

    has_pred = np.abs(pred).sum(axis=-1) > 0
    predictive = (
        float(np.mean(np.sum((pred[has_pred] - emb[has_pred]) ** 2, -1)))
        if has_pred.any()
        else 0.0
    )

    decoded = np.asarray(
        embeddings_module.apply(
            variables,
            jnp.asarray(emb),
            method=type(embeddings_module).decode_position,
        )
    )
    positional_recovery = float(np.mean(np.sum((decoded - query) ** 2, -1)))

    raw = np.asarray(trace.get("raw_embedding", emb), np.float32)
    preservation = float(np.mean(np.sum((emb - raw) ** 2, -1)))

    return {
        "predictive": predictive,
        "positional_recovery": positional_recovery,
        "preservation": preservation,
    }
