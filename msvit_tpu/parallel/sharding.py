"""Sharding rules for msvit param pytrees.

Tensor-parallel layout (Megatron-style column→row pairs, expressed purely
as PartitionSpecs — XLA/GSPMD inserts the all-reduces):

* attention: qkv_kernel [D, 3, H, Dh] shards heads on "model" (column
  parallel); output_dense kernel [H·Dh, D] shards its input dim (row
  parallel) → one psum per attention block.
* MLP: fc1 / weights_in kernel [D, F] shards F (column); fc2 /
  weights_out kernel [F, D] shards its input dim (row) → one psum.
* everything else (LayerNorms, layer scales, embeddings, heads, biases of
  row-parallel layers) is replicated.

Activations: batch on "data"; the hidden token axis stays unsharded
(sequence lengths here are ≤ ~1.6k — SURVEY §5 long-context note).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def partition_spec_for_params(path: Tuple[str, ...], leaf: Any) -> P:
    """Rule-based PartitionSpec from a param path (tuple of name strings)."""
    name = path[-1]
    parent = path[-2] if len(path) >= 2 else ""

    if name == "qkv_kernel":  # [D, 3, H, Dh] — shard heads
        return P(None, None, "model", None)
    if name == "qkv_bias":  # [3, H, Dh]
        return P(None, "model", None)
    if parent == "output_dense" and name == "kernel":  # [H*Dh, D] — row parallel
        return P("model", None)
    if parent in ("fc1", "weights_in") and name == "kernel":  # [D, F] — column
        return P(None, "model")
    if parent in ("fc1", "weights_in") and name == "bias":
        return P("model")
    if parent in ("fc2", "weights_out") and name == "kernel":  # [F, D] — row
        return P("model", None)
    # expert parallelism: MoE expert tensors shard their expert axis
    if name in ("experts_in", "experts_out"):  # [E, D, F] / [E, F, D]
        return P("model", None, None)
    if name in ("experts_in_bias", "experts_out_bias"):  # [E, F] / [E, D]
        return P("model", None)
    return P()  # replicated


def _path_names(key_path) -> Tuple[str, ...]:
    names = []
    for k in key_path:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "name"):
            names.append(str(k.name))
        else:
            names.append(str(k))
    return tuple(names)


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """NamedSharding pytree matching `params` under the TP rules."""
    return jax.tree_util.tree_map_with_path(
        lambda kp, leaf: NamedSharding(
            mesh, partition_spec_for_params(_path_names(kp), leaf)
        ),
        params,
    )


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Place a param pytree onto the mesh under the TP rules."""
    return jax.device_put(params, param_shardings(mesh, params))
