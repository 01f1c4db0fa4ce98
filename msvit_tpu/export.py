"""AOT export: serialize a jitted msvit forward to a portable artifact
and reload it with no model code or Python tracing at load time.

New capability relative to the reference (it has no deployment story —
`sandbox/test.py` is a one-shot eager script); this completes the
serving stack around `serve.BatchingServer`: a training host exports the
flagship forward once, a fleet of serving hosts `load()`s the artifact
and runs it, never importing flax or the model zoo.

TPU-first design points:

* Built on `jax.export` (StableHLO serialization): the artifact embeds
  the lowered module, the input/output trees and shardings — it survives
  process restarts, different hosts, and (within jax's compatibility
  guarantees) different jax versions, unlike
  `jax.experimental.serialize_executable` which pins the exact compiled
  binary to one topology.
* Params ride inside or outside the artifact, caller's choice.
  `export_forward(..., bundle_params=True)` closes the concrete weights
  into the artifact as frozen constants — one self-contained file, the
  right shape for a model-as-a-file registry.  The default keeps params
  an argument (artifact stays small, weights come from a checkpoint) —
  and under the axon remote-compile relay bundling a full ViT-B exceeds
  the payload limit (CLAUDE.md), so args-mode is also the only mode that
  compiles on this tunnel.
* Multi-platform: `platforms=("tpu", "cpu")` records lowerings for both
  so one artifact serves the fleet and the CI host.

Usage:

    art = export_forward(fn, (params, batch))         # bytes
    Path("vit.msvx").write_bytes(art)
    g = load_forward(Path("vit.msvx").read_bytes())
    y = g(params, batch)                              # compiles once, runs
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as _jx


def _abstractify(tree: Any, batch_dim: Any = None) -> Any:
    """Shapes/dtypes of a pytree; with `batch_dim` (a symbolic dimension)
    every leaf's leading axis is replaced by it."""

    def one(x):
        shape = jnp.shape(x)
        if batch_dim is not None and len(shape) > 0:
            shape = (batch_dim,) + shape[1:]
        return jax.ShapeDtypeStruct(shape, jnp.result_type(x))

    return jax.tree.map(one, tree)


def export_forward(
    fn: Callable[..., Any],
    example_args: Tuple[Any, ...],
    *,
    platforms: Optional[Sequence[str]] = None,
    bundle_params: bool = False,
    polymorphic_batch: bool = False,
) -> bytes:
    """Serialize `jit(fn)(*example_args)` to a portable artifact.

    `example_args` supplies shapes/dtypes only (abstract values are
    fine) — unless `bundle_params=True`, in which case `example_args[0]`
    must be the concrete param pytree and is frozen into the artifact
    (the exported callable then takes the remaining args).

    `polymorphic_batch=True` exports with a symbolic leading ("b") axis
    on the data args (params keep concrete shapes): one artifact serves
    every batch size — what `serve.BatchingServer`'s bucket ladder needs
    — at the cost of compiling per concrete size at load site (exactly
    the bucket-warmup model).
    """
    bdim = (
        _jx.symbolic_shape("b")[0] if polymorphic_batch else None
    )
    if bundle_params:
        params = example_args[0]
        rest = example_args[1:]
        closed = lambda *a: fn(params, *a)  # noqa: E731
        exp = _jx.export(
            jax.jit(closed), platforms=tuple(platforms) if platforms else None
        )(*_abstractify(rest, bdim))
    else:
        params_abs = _abstractify(example_args[0])
        rest_abs = _abstractify(example_args[1:], bdim)
        exp = _jx.export(
            jax.jit(fn), platforms=tuple(platforms) if platforms else None
        )(params_abs, *rest_abs)
    return bytes(exp.serialize())  # serialize() yields bytearray


def load_forward(artifact: bytes) -> Callable[..., Any]:
    """Rehydrate an exported artifact into a callable.  The result is
    jittable (compiles on first call per shape, cached after) and
    differentiable if the export recorded a VJP."""
    exp = _jx.deserialize(artifact)
    return jax.jit(exp.call)


def aot_compile(
    fn: Callable[..., Any], example_args: Tuple[Any, ...]
) -> Tuple[Callable[..., Any], dict]:
    """Ahead-of-time compile within this process: returns the compiled
    executable (no retrace on call) and its XLA cost analysis
    ({flops, bytes accessed, ...}) — the warmup path `serve.BatchingServer
    .warmup()` wants, plus the numbers a capacity planner wants."""
    lowered = jax.jit(fn).lower(*_abstractify(example_args))
    compiled = lowered.compile()
    try:
        cost = dict(compiled.cost_analysis() or {})
    except Exception:  # pragma: no cover - backend-dependent
        cost = {}
    return compiled, cost
