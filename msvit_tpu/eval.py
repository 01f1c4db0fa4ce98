"""Evaluation loop: jitted top-k accuracy / loss accumulation.

The reference has no evaluation story (its sandbox scripts print losses
only); this is the standard counterpart a classifier user needs.  It
pairs with any family's `ForImageClassification.apply` (base, multistate,
subsample) — anything that maps a pixel batch to logits.

TPU-first design points:

* One jitted step computes per-batch *sums* (correct@k counts, summed
  loss, example count) — scalars stay on device and accumulate there;
  the host syncs once at the end, not per batch (the ~28 ms tunnel
  sync, CLAUDE.md).
* Static shapes: the last partial batch is padded up and masked via
  `valid` (weights 0/1), never run ragged.
* top-k via one `lax.top_k` over the logits — no sort of the full
  class axis.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


def make_eval_step(
    logits_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    topk: Sequence[int] = (1, 5),
):
    """Build a jitted step: (params, pixel_values, labels, valid) →
    {"n": Σvalid, "loss_sum": Σ ce·valid, "correct@k": Σ hit_k·valid}.

    `logits_fn(params, pixel_values)` → [B, C] logits.  `valid` is a
    0/1 float mask of real (non-padding) rows."""
    ks = tuple(int(k) for k in topk)
    kmax = max(ks)

    def step(params, pixel_values, labels, valid):
        logits = logits_fn(params, pixel_values).astype(jnp.float32)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        _, top_idx = jax.lax.top_k(logits, kmax)  # [B, kmax] sorted desc
        hits = top_idx == labels[:, None]  # [B, kmax]
        out = {
            "n": jnp.sum(valid),
            "loss_sum": jnp.sum(ce * valid),
        }
        for k in ks:
            out[f"correct@{k}"] = jnp.sum(
                jnp.any(hits[:, :k], axis=-1).astype(jnp.float32) * valid
            )
        return out

    return jax.jit(step)


def evaluate(
    logits_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    params: Any,
    batches: Iterable[Dict[str, Any]],
    topk: Sequence[int] = (1, 5),
    batch_size: Optional[int] = None,
) -> Dict[str, float]:
    """Run the eval loop over `batches` (dicts with "pixel_values" [B,...]
    and "labels" [B]; optional "valid" [B] 0/1).  Short batches are
    padded up to `batch_size` (default: the first batch's size) so every
    step reuses one compiled program.  Returns {"n", "loss",
    "top{k}_acc"...} — one host sync total."""
    step = make_eval_step(logits_fn, topk)
    totals: Optional[Dict[str, jnp.ndarray]] = None
    for batch in batches:
        pix = jnp.asarray(batch["pixel_values"])
        labels = jnp.asarray(batch["labels"])
        b = pix.shape[0]
        if batch_size is None:
            batch_size = b
        valid = jnp.asarray(
            batch.get("valid", jnp.ones((b,), jnp.float32)), jnp.float32
        )
        if b < batch_size:
            pad = batch_size - b
            pix = jnp.concatenate(
                [pix, jnp.zeros((pad,) + pix.shape[1:], pix.dtype)]
            )
            labels = jnp.concatenate([labels, jnp.zeros((pad,), labels.dtype)])
            valid = jnp.concatenate([valid, jnp.zeros((pad,), jnp.float32)])
        elif b > batch_size:
            raise ValueError(
                f"batch of {b} exceeds eval batch_size {batch_size}"
            )
        part = step(params, pix, labels, valid)
        totals = (
            part
            if totals is None
            else jax.tree.map(jnp.add, totals, part)
        )
    if totals is None:
        return {"n": 0.0}
    host: Dict[str, float] = {
        k: float(v) for k, v in totals.items()
    }  # one sync
    n = max(host["n"], 1.0)
    out = {"n": host["n"], "loss": host["loss_sum"] / n}
    for k, v in host.items():
        if k.startswith("correct@"):
            out[f"top{k.split('@')[1]}_acc"] = v / n
    return out
