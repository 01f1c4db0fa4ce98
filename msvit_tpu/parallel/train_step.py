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


def _zero1_spec(spec: P, shape, data_size: int):
    """Extend a param's PartitionSpec with "data" on one axis (ZeRO-1).

    Picks the largest axis that is still unsharded and divisible by the
    data-parallel degree; returns None when no axis qualifies (the leaf
    stays at the param's own sharding).
    """
    ndim = len(shape)
    entries = list(spec) + [None] * (ndim - len(spec))
    best = -1
    for i, (s, n) in enumerate(zip(entries, shape)):
        if s is None and n > 0 and n % data_size == 0:
            if best < 0 or n > shape[best]:
                best = i
    if best < 0:
        return None
    entries[best] = "data"
    return P(*entries)


def make_sharded_train_step(
    loss_fn: Callable[..., Tuple[jnp.ndarray, Any]],
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    params: Any,
    donate: bool = True,
    zero1: bool = False,
    fsdp: bool = False,
):
    """Build (step, sharded_params, sharded_opt_state).

    loss_fn(params, batch, rng) -> (scalar loss, aux dict).
    The returned step is jitted with explicit shardings:
    params/opt_state per TP rules, batch on "data".

    zero1=True additionally shards optimizer-state tensors (adam m/v)
    over the "data" axis — ZeRO stage 1: params stay replicated across
    DP, but each DP rank keeps only 1/dp of the optimizer state and
    updates its slice; GSPMD inserts the grad reduce-scatter and the
    update all-gather.  At dp=8 this is 8x less optimizer HBM per
    device (ViT-B adamw f32 m+v: 686 MB -> 86 MB).

    fsdp=True shards the PARAMS THEMSELVES (and, by inheritance, grads
    and optimizer state) over the "data" axis on top of any TP sharding
    — ZeRO stage 3 / fully-sharded data parallel, expressed purely as
    in/out shardings: GSPMD all-gathers each weight just before use
    (fwd and again in bwd), reduce-scatters gradients, and updates only
    the local 1/dp shard.  Per-device steady state is (params + m + v)
    / dp + one transiently gathered layer — the standard JAX FSDP
    recipe (scaling-book), no wrapper classes.  Leaves with no
    dp-divisible unsharded axis (layernorm scales, small biases) stay
    at their TP sharding.  `zero1` is subsumed (the opt state already
    inherits the fsdp sharding).
    """
    p_shard = param_shardings(mesh, params)
    data_size = mesh.shape.get("data", 1)
    if fsdp and data_size > 1:
        def _fsdp_one(s, leaf):
            z = _zero1_spec(s.spec, leaf.shape, data_size)
            return NamedSharding(mesh, z) if z is not None else s

        p_shard = jax.tree.map(_fsdp_one, p_shard, params)
        zero1 = False  # opt state inherits the fsdp sharding below
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
                    if zero1 and data_size > 1:
                        z = _zero1_spec(s.spec, leaf.shape, data_size)
                        if z is not None:
                            return NamedSharding(mesh, z)
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
