"""Pipeline parallelism (GPipe-style) over a "stage" mesh axis.

New capability beyond the reference (which is single-GPU; SURVEY §2.10):
the trunk's layer stack is split into S contiguous stages, each stage's
params live on one device slice along the "stage" axis, and microbatches
flow through a `shard_map` whose per-tick communication is a ring
`ppermute` — activations hop stage s → s+1 while stage s starts the next
microbatch.  The schedule is the standard padded GPipe loop of
S + M − 1 ticks (every stage computes every tick; inactive ticks are
masked), which keeps all shapes static and is differentiable end-to-end
(grads flow back through `ppermute`).

Use when a model is too large for one chip's HBM; at reference scale
(ViT-B) this exists for capability and is exercised on the virtual CPU
mesh by tests/test_pipeline.py (pipelined ≡ sequential).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.9
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)

except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs
        )


def split_layers_into_stages(
    encoder_params: Dict[str, Any], num_stages: int
) -> Any:
    """{"layer_0".."layer_{L-1}"} → stacked pytree with leading axes
    [S, L/S, ...] (stage-major, scan-ready)."""
    names = sorted(encoder_params, key=lambda k: int(k.split("_")[1]))
    n = len(names)
    if n % num_stages:
        raise ValueError(f"{n} layers not divisible by {num_stages} stages")
    per = n // num_stages
    stages = []
    for s in range(num_stages):
        group = [encoder_params[names[s * per + j]] for j in range(per)]
        stages.append(jax.tree.map(lambda *xs: jnp.stack(xs), *group))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *stages)


def gpipe(
    stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    num_stages: int,
    num_microbatches: int,
    mesh: Mesh,
    stage_axis: str = "stage",
):
    """Build `run(stage_params, x_mb, extras_mb=None)`:
    stage_params — pytree with leading [S] axis (see
    `split_layers_into_stages`); x_mb — [M, mb, ...] microbatched input.
    extras_mb (optional) — pytree of per-microbatch side inputs with
    leading axis [M] (e.g. attention masks) that are NOT transformed by
    stages: each stage indexes the entry of the microbatch it is
    currently processing (t − s) and calls ``stage_fn(params, x, extras)``.
    Returns [M, mb, ...] outputs of the final stage, replicated."""
    s_total, m_total = num_stages, num_microbatches

    def run(stage_params, x_mb, extras_mb=None):
        has_extras = extras_mb is not None

        def spmd(params_local, x_local, *extras_args):
            extras_local = extras_args[0] if has_extras else None
            s = jax.lax.axis_index(stage_axis)
            my_params = jax.tree.map(lambda a: a[0], params_local)
            mb_shape = x_local.shape[1:]
            buf = jnp.zeros(mb_shape, x_local.dtype)
            outputs = jnp.zeros((m_total,) + mb_shape, x_local.dtype)
            # the carry becomes stage-varying inside the loop; mark the
            # (invariant) zeros initializers accordingly for shard_map's
            # varying-manner type check
            buf, outputs = jax.lax.pcast(
                (buf, outputs), (stage_axis,), to="varying"
            )
            perm = [(i, (i + 1) % s_total) for i in range(s_total)]

            def tick(t, carry):
                buf, outputs = carry
                mb_idx = jnp.clip(t, 0, m_total - 1)
                first_in = jax.lax.dynamic_index_in_dim(
                    x_local, mb_idx, 0, keepdims=False
                )
                inp = jnp.where(s == 0, first_in, buf)
                if has_extras:
                    my_mb = jnp.clip(t - s, 0, m_total - 1)
                    extras = jax.tree.map(
                        lambda a: jax.lax.dynamic_index_in_dim(
                            a, my_mb, 0, keepdims=False
                        ),
                        extras_local,
                    )
                    out = stage_fn(my_params, inp, extras)
                else:
                    out = stage_fn(my_params, inp)
                active = jnp.logical_and(t - s >= 0, t - s < m_total)
                out = jnp.where(active, out, jnp.zeros_like(out))
                rec_idx = jnp.clip(t - (s_total - 1), 0, m_total - 1)
                record = jnp.logical_and(s == s_total - 1, active)
                outputs = jnp.where(
                    record,
                    jax.lax.dynamic_update_index_in_dim(
                        outputs, out, rec_idx, 0
                    ),
                    outputs,
                )
                buf = jax.lax.ppermute(out, stage_axis, perm)
                return buf, outputs

            buf, outputs = jax.lax.fori_loop(
                0, s_total + m_total - 1, tick, (buf, outputs)
            )
            # replicate the last stage's outputs everywhere
            outputs = jax.lax.psum(
                jnp.where(s == s_total - 1, outputs, jnp.zeros_like(outputs)),
                stage_axis,
            )
            return outputs

        args = (stage_params, x_mb) + ((extras_mb,) if has_extras else ())
        in_specs = (P(stage_axis), P()) + ((P(),) if has_extras else ())
        return shard_map(
            spmd,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=P(),
        )(*args)

    return run


def make_layer_stage_fn(layer_module):
    """stage_fn for a stack of identical flax layers: scans the stage's
    [L/S, ...] stacked params through `layer_module.apply`.  The optional
    ``extras`` pytree may carry an "attention_mask" threaded to every
    layer (gpipe indexes it per microbatch)."""

    def stage_fn(stacked_params, x, extras=None):
        mask = None if extras is None else extras.get("attention_mask")

        def body(h, layer_params):
            out, _ = layer_module.apply(
                {"params": layer_params}, h, None, mask
            )
            return out, None

        out, _ = jax.lax.scan(body, x, stacked_params)
        return out

    return stage_fn
