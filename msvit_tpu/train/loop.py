"""Generic train-step scaffolding (optax).

TPU-native counterpart of the reference's eager AdamW loops
(`sandbox/predictive.py:96-137`, `sandbox/subsample_vit.py:82-126`):
one jitted step, donated state, explicit PRNG threading, optional
trainable-parameter filtering (the subsample script trains only the
policy projection — `sandbox/subsample_vit.py:85-88`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass
class TrainState:
    step: int
    params: Any
    opt_state: Any


def make_optimizer(
    learning_rate: float = 1e-3,
    weight_decay: float = 1e-2,
    trainable: Optional[Callable[[Tuple[str, ...]], bool]] = None,
    mu_dtype=None,
) -> optax.GradientTransformation:
    """AdamW, optionally masked to a trainable subset by param path
    (frozen params get zero updates).  ``mu_dtype=jnp.bfloat16`` stores
    the first moment in bf16 — halves its HBM footprint/traffic (the
    second moment stays f32: its EMA of tiny squared grads underflows
    bf16's 8-bit mantissa)."""
    opt = optax.adamw(
        learning_rate, weight_decay=weight_decay, mu_dtype=mu_dtype
    )
    if trainable is None:
        return opt

    def label_fn(params):
        def path_names(kp):
            return tuple(
                str(getattr(k, "key", getattr(k, "name", k))) for k in kp
            )

        return jax.tree_util.tree_map_with_path(
            lambda kp, _: "train" if trainable(path_names(kp)) else "freeze",
            params,
        )

    return optax.multi_transform(
        {"train": opt, "freeze": optax.set_to_zero()}, label_fn
    )


def train_step_fn(
    loss_fn: Callable[[Any, Any, jax.Array], Tuple[jnp.ndarray, Any]],
    optimizer: optax.GradientTransformation,
    donate: bool = True,
    num_microbatches: int = 1,
    monitor: bool = False,
    ema_decay: Optional[float] = None,
):
    """Build a jitted step: (params, opt_state, batch, rng) →
    (params, opt_state, loss, aux).  loss_fn(params, batch, rng) →
    (scalar, aux).

    With `ema_decay` the step takes and returns one extra pytree — an
    exponential moving average of the params (`ema·d + p·(1−d)` after the
    update), fused into the same compiled program so tracking costs zero
    extra dispatches: (params, opt_state, batch, rng, ema) →
    (params, opt_state, loss, aux, ema).  The standard serving-weights
    trick; Trainer(ema_decay=...) wires it end-to-end (checkpoint/resume
    included).

    num_microbatches > 1 enables gradient accumulation: the batch's
    leading axis is split into that many microbatches and a single
    `lax.scan` inside the jit accumulates the mean gradient — one
    optimizer update, one compiled program, no per-microbatch host
    round-trips.  With mean-reduced losses and equal microbatch sizes
    this is numerically the full-batch gradient, at ~1/M the activation
    memory (an alternative to remat for large effective batches)."""

    def grad_once(params, batch, rng):
        return jax.value_and_grad(loss_fn, has_aux=True)(params, batch, rng)

    def step(params, opt_state, batch, rng, ema=None):
        if num_microbatches > 1:
            m = num_microbatches

            def split(x):
                assert x.shape[0] % m == 0, (
                    f"batch axis {x.shape[0]} not divisible by "
                    f"num_microbatches={m}"
                )
                return x.reshape((m, x.shape[0] // m) + x.shape[1:])

            micro = jax.tree.map(split, batch)
            keys = jax.random.split(rng, m)

            def body(g_acc, mb_key):
                mb, key = mb_key
                (loss, aux), g = grad_once(params, mb, key)
                # accumulate in f32 even under a bf16 param policy
                g_acc = jax.tree.map(
                    lambda a, b: a + b.astype(jnp.float32), g_acc, g
                )
                return g_acc, (loss, aux)

            g0 = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), params
            )
            g_sum, (losses, auxs) = jax.lax.scan(body, g0, (micro, keys))
            grads = jax.tree.map(
                lambda g, p: (g / m).astype(p.dtype), g_sum, params
            )
            loss = losses.mean()
            aux = jax.tree.map(lambda a: a.mean(axis=0), auxs)
        else:
            (loss, aux), grads = grad_once(params, batch, rng)
        if monitor:
            # stays on device (no per-step host sync): the Trainer reads
            # these only at log boundaries, where it syncs anyway
            aux = dict(aux or {})
            aux["grad_norm"] = optax.global_norm(grads)
            leaf_ok = [
                jnp.all(jnp.isfinite(g.astype(jnp.float32)))
                for g in jax.tree_util.tree_leaves(grads)
            ]
            aux["grads_finite"] = jnp.all(jnp.stack(leaf_ok)) & jnp.isfinite(
                loss.astype(jnp.float32)
            )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if ema_decay is not None:
            d = ema_decay
            ema = jax.tree.map(
                lambda e, p: d * e + (1.0 - d) * p.astype(e.dtype),
                ema,
                params,
            )
            return params, opt_state, loss, aux, ema
        return params, opt_state, loss, aux

    if ema_decay is not None:
        return jax.jit(step, donate_argnums=(0, 1, 4) if donate else ())
    return jax.jit(step, donate_argnums=(0, 1) if donate else ())
