"""Predictive-encoder training losses
(reference `model/predictive_encoder/modeling_training.py:55-249`).

Each loss re-runs parts of the model (position decoding, re-embedding at
predicted locations, patch decoding) — expressed here via
`model.apply(variables, ..., method=...)` so the whole objective is one
differentiable jitted graph.  Variable-length contexts are handled with
the static-max + mask scheme (`sum_error_with_context_lengths`,
reference `:62-66`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from msvit_tpu.models.predictive.config import (
    PredictiveViTConfig,
    PredictiveViTTrainingConfig,
)
from msvit_tpu.models.predictive.model import PredictiveViTModel, _config_scale


def sum_error_with_context_lengths(error, context_lengths):
    """Mask per-token errors beyond each sample's context length and sum
    (reference `:62-66`)."""
    mask = jnp.arange(error.shape[-1])[None] < context_lengths[:, None]
    return jnp.sum(error * mask, axis=-1)


def _sq_norm(x, axis=-1):
    return jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis)


def _apply(model, variables, method, *args, **kwargs):
    return model.apply(variables, *args, method=method, **kwargs)


def preservation_loss(model, variables, pixel_values, output):
    """Output context embeddings ≈ input embeddings (reference `:69-81`)."""
    inp = output["input_hidden_state"][:, 1:-1]
    out = output["last_hidden_state"][:, 1:-1]
    err = sum_error_with_context_lengths(
        _sq_norm(out - inp), output["context_lengths"]
    )
    return err / model.config.expected_context_length, {}


def _prediction_error(model, variables, pixel_values, predicted_state):
    """Decode latents to positions, re-embed the image there, L2 in latent
    space (reference `:85-97`)."""
    pos, _ = _apply(
        model, variables, PredictiveViTModel.latent_to_position, predicted_state
    )
    true_state = _apply(
        model, variables, PredictiveViTModel.embed, pixel_values, pos
    )[:, 1:-1]
    err = _sq_norm(predicted_state - true_state)
    return err, {"config": pos, "true_state": true_state}


def context_prediction_loss(model, variables, pixel_values, output):
    pred = output["last_hidden_state"][:, 1:-1]
    err, meta = _prediction_error(model, variables, pixel_values, pred)
    err = (
        sum_error_with_context_lengths(err, output["context_lengths"])
        / model.config.expected_context_length
    )
    return err, {
        "predicted_context_position": meta["config"],
        "true_context_state": meta["true_state"],
    }


def query_prediction_loss(model, variables, pixel_values, output):
    pred = output["last_hidden_state"][:, -1:]
    err, meta = _prediction_error(model, variables, pixel_values, pred)
    return err[:, 0], {
        "predicted_query_position": meta["config"][:, 0],
        "true_query_state": meta["true_state"][:, 0],
    }


def _patch_prediction_error(model, variables, pixel_values, predicted_state):
    """Decode latent → position + orthogonal component → pixel patch via
    the deconv decoder; compare to the true glimpse (reference `:130-146`)."""
    pos, orthogonal = _apply(
        model,
        variables,
        PredictiveViTModel.latent_to_position,
        predicted_state,
        True,
    )
    predicted_patch = _apply(
        model,
        variables,
        lambda m, x: m.patch_embeddings.latent_to_patch(x),
        orthogonal,
    )
    true_patch = _apply(
        model,
        variables,
        lambda m, pv, pc: m.patch_embeddings.position_to_patch(pv, pc),
        pixel_values,
        pos,
    )
    diff = (predicted_patch - true_patch).reshape(predicted_patch.shape[:-3] + (-1,))
    err = _sq_norm(diff)
    return err, {
        "config": pos,
        "predicted_patch": predicted_patch,
        "true_patch": true_patch,
    }


def context_patch_prediction_loss(model, variables, pixel_values, output):
    pred = output["last_hidden_state"][:, 1:-1]
    err, meta = _patch_prediction_error(model, variables, pixel_values, pred)
    err = sum_error_with_context_lengths(err, output["context_lengths"]) / (
        model.config.expected_context_length * model.config.patch_size**2
    )
    return err, {
        "predicted_context_position": meta["config"],
        "predicted_context_patch": meta["predicted_patch"],
        "true_context_patch": meta["true_patch"],
    }


def query_patch_prediction_loss(model, variables, pixel_values, output):
    pred = output["last_hidden_state"][:, -1:]
    err, meta = _patch_prediction_error(model, variables, pixel_values, pred)
    return err[:, 0] / model.config.patch_size**2, {
        "predicted_query_position": meta["config"][:, 0],
        "predicted_query_patch": meta["predicted_patch"][:, 0],
        "true_query_patch": meta["true_patch"][:, 0],
    }


def positional_recovery_loss(model, variables, pixel_values, output):
    """Decoded positions of context outputs ≈ the sampled positions
    (reference `:181-195`)."""
    pred = output["last_hidden_state"][:, 1:-1]
    pos, _ = _apply(
        model, variables, PredictiveViTModel.latent_to_position, pred
    )
    err = sum_error_with_context_lengths(
        _sq_norm(pos - output["input_position"]), output["context_lengths"]
    )
    return err / model.config.expected_context_length, {}


def positional_regularization_loss(model, variables, pixel_values, output):
    """Decoded (unscaled) positions near the origin (reference `:198-221`)."""
    pred = output["last_hidden_state"][:, 1:]  # contexts + PRD
    pos, _ = _apply(
        model, variables, PredictiveViTModel.latent_to_position, pred
    )
    scale, shift = _config_scale(model.config)
    pos = (pos - shift) / scale
    err = sum_error_with_context_lengths(
        _sq_norm(pos)[:, :-1], output["context_lengths"]
    ) + _sq_norm(pos[:, -1])
    return err / (model.config.expected_context_length + 1), {}


LOSS2FN: Dict[str, Callable] = {
    "preservation": preservation_loss,
    "context_prediction": context_prediction_loss,
    "query_prediction": query_prediction_loss,
    "context_patch_prediction": context_patch_prediction_loss,
    "query_patch_prediction": query_patch_prediction_loss,
    "positional_recovery": positional_recovery_loss,
    "positional_regularization": positional_regularization_loss,
}

# losses measured as squared distances between D-dim latents: their raw
# value scales with the embedding second moment (see
# PredictiveViTTrainingConfig.normalize_latent)
_LATENT_LOSSES = ("preservation", "context_prediction", "query_prediction")


def patch_mean_bar(output: Dict[str, Any], losses_meta: Dict[str, Any],
                   config: PredictiveViTConfig) -> Dict[str, jnp.ndarray]:
    """Predict-the-mean baselines for the patch losses (VERDICT r4
    item 7): the loss a constant predictor emitting the batch-mean TRUE
    patch would score, in the same units as context/query
    patch_prediction (squared error / patch_size²).  A model whose
    query_patch loss sits AT this bar has learned nothing beyond the
    corpus's mean appearance; below it, it uses the context.

    Needs the meta dict from `training_loss` with the patch losses
    active (true_context_patch / true_query_patch recorded)."""
    bars: Dict[str, jnp.ndarray] = {}
    p2 = float(config.patch_size**2)
    if "true_query_patch" in losses_meta:
        tq = losses_meta["true_query_patch"].astype(jnp.float32)  # [B,P,P,C]
        mean = jnp.mean(tq, axis=0, keepdims=True)
        bars["query_patch_mean_bar"] = jnp.mean(
            jnp.sum(jnp.square(tq - mean).reshape(tq.shape[0], -1), -1)
        ) / p2
    if "true_context_patch" in losses_meta:
        tc = losses_meta["true_context_patch"].astype(jnp.float32)  # [B,N,P,P,C]
        lengths = output["context_lengths"]
        mask = (
            jnp.arange(tc.shape[1])[None] < lengths[:, None]
        ).astype(jnp.float32)
        flat = tc.reshape(tc.shape[0] * tc.shape[1], -1)
        w = mask.reshape(-1)[:, None]
        denom = jnp.maximum(jnp.sum(w), 1.0)
        mean = jnp.sum(flat * w, axis=0, keepdims=True) / denom
        err = jnp.sum(jnp.square(flat - mean), -1) * w[:, 0]
        bars["context_patch_mean_bar"] = jnp.sum(err) / denom / p2
    return bars


def training_loss(
    model: PredictiveViTModel,
    variables: Any,
    pixel_values: jnp.ndarray,
    output: Dict[str, Any],
    train_config: PredictiveViTTrainingConfig,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Weighted sum over active losses; returns (per-sample error [B],
    per-loss dict, detached meta for visualization) —
    reference `training_loss` (`:235-249`)."""
    losses: Dict[str, jnp.ndarray] = {}
    meta: Dict[str, jnp.ndarray] = {}
    error = jnp.zeros(pixel_values.shape[0], jnp.float32)
    if train_config.normalize_latent:
        # stop-gradient mean second moment of the input embeddings: the
        # natural scale of latent-space squared distances.  Dividing by
        # it makes the latent losses scale-invariant (the optimizer can
        # no longer "improve" them by shrinking embeddings, nor do they
        # read as regressing when embeddings legitimately grow).
        inp = output["input_hidden_state"].astype(jnp.float32)
        m2 = jax.lax.stop_gradient(
            jnp.mean(jnp.sum(jnp.square(inp), -1)) + 1e-6
        )
    for k, weight in dataclasses.asdict(train_config).items():
        if weight != 0.0 and k in LOSS2FN and isinstance(weight, float):
            e, m = LOSS2FN[k](model, variables, pixel_values, output)
            if train_config.normalize_latent and k in _LATENT_LOSSES:
                e = e / m2
            error = error + weight * e
            losses[k] = e
            meta.update({mk: jax.lax.stop_gradient(mv) for mk, mv in m.items()})
    return error, losses, meta
