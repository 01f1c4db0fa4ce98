"""Multi-host (pod-scale) glue.

The reference is single-GPU (SURVEY §2.10: no distributed backend at
all); this is the TPU-pod story: one JAX process per host, ICI/DCN
collectives inserted by XLA from shardings.  Everything here is a thin,
deterministic wrapper — the heavy lifting is `jax.distributed` and
`make_array_from_process_local_data`.

Typical pod training setup:

    from msvit_tpu.parallel import distributed as dist
    dist.initialize()                        # no-op on single host
    shard_i, shard_n = dist.host_shard()
    sampler = IndexSampler(..., shard_index=shard_i, shard_count=shard_n)
    mesh = make_mesh(tp=...)                 # global mesh over all hosts
    batch = dist.global_batch(mesh, local_batch)   # host-local -> global

Every host feeds only its own examples (the `IndexSampler` shard slice
is derived from the same Feistel order on every host, so the union is
exactly one epoch), and `global_batch` assembles the logically-global
array without any cross-host data movement.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """`jax.distributed.initialize` wrapper.

    On Cloud TPU pods all three arguments are discovered from the
    environment (call with no args).  A no-op when the runtime is
    already initialized or when running single-process (so the same
    training script runs unchanged on one chip and on a pod)."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # single-process run (no coordinator discoverable) or already
        # initialized — both are fine
        pass


def host_shard() -> Tuple[int, int]:
    """(shard_index, shard_count) for input sharding: feed it to
    `data.resumable.IndexSampler` so each host reads a disjoint slice of
    the same global epoch order."""
    return jax.process_index(), jax.process_count()


def host_batch_size(global_batch_size: int) -> int:
    """Per-host batch size for an evenly host-sharded global batch."""
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{n} processes"
        )
    return global_batch_size // n


def global_batch(
    mesh: Mesh,
    local_batch: Any,
    spec: P = P("data"),
) -> Any:
    """Assemble host-local arrays into logically-global jax.Arrays
    sharded by `spec` over `mesh` (zero cross-host transfer: each host's
    shard is its own data).  Works on pytrees (dict batches)."""

    def one(x):
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(one, local_batch)
