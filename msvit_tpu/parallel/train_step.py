"""Sharded training steps (pjit).

Builds a jitted train step over a ("data", "model") mesh: batch sharded on
"data", params sharded by the TP rules in `msvit_tpu.parallel.sharding`,
gradients psum'd automatically by GSPMD.  This is the TPU-native
counterpart of the reference's eager single-GPU loops
(`sandbox/predictive.py:98-134`, `sandbox/subsample_vit.py:91-126`).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from msvit_tpu.parallel.sharding import param_shardings


def make_sharded_train_step(
    loss_fn: Callable[..., Tuple[jnp.ndarray, Any]],
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    params: Any,
    donate: bool = True,
):
    """Build (step, sharded_params, sharded_opt_state).

    loss_fn(params, batch, rng) -> (scalar loss, aux dict).
    The returned step is jitted with explicit shardings:
    params/opt_state per TP rules, batch on "data".
    """
    p_shard = param_shardings(mesh, params)
    params = jax.device_put(params, p_shard)
    opt_state = optimizer.init(params)

    # Optimizer-state sharding: leaves shaped like a param (adam m/v)
    # reuse that param's sharding; scalars/counters are replicated.
    flat_params = jax.tree.leaves(params)
    flat_shards = jax.tree.leaves(p_shard)

    def opt_leaf_sharding(leaf):
        if hasattr(leaf, "shape"):
            for p_leaf, s in zip(flat_params, flat_shards):
                if leaf.shape == p_leaf.shape and leaf.shape != ():
                    return s
        return NamedSharding(mesh, P())

    o_shard = jax.tree.map(opt_leaf_sharding, opt_state)
    opt_state = jax.device_put(opt_state, o_shard)

    batch_shard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def _step(params, opt_state, batch, rng):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    step = jax.jit(
        _step,
        in_shardings=(p_shard, o_shard, None, repl),
        out_shardings=(p_shard, o_shard, repl, None),
        donate_argnums=(0, 1) if donate else (),
    )
    return step, params, opt_state, batch_shard
