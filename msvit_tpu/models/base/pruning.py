"""Attention-head pruning (reference `modeling_base.py:183-219`,
HF `prune_heads` semantics: drop the selected heads' q/k/v projections
and the matching input rows of the attention output projection).

Two modes, because the HF formulation is shape-dynamic and TPU programs
are not:

* `prune_heads` — true parameter surgery, mirroring HF exactly.  All
  layers must end with the SAME head count (one static
  `num_attention_heads` in the config drives every layer's program);
  returns (new_params, new_config) with `attention_head_size` pinned so
  `head_dim` survives a non-divisible head count (HF likewise keeps the
  original `attention_head_size` on the pruned module).
* `prune_heads_masked` — zeroes the pruned heads' q/k/v parameters and
  the corresponding output-projection rows in place.  A head with
  v ≡ 0 contributes exactly 0 through zeroed projection rows, so the
  output is bit-for-bit the pruned model's output while every shape —
  and therefore every compiled program, sharding, and checkpoint
  layout — is unchanged.  Supports arbitrary per-layer head sets (the
  general HF contract) and is the recommended mode on TPU: at ViT
  scale the FLOP savings of physically removing a few heads is below
  XLA's tile-padding granularity anyway.

Both are golden-tested against `transformers.ViTModel.prune_heads`
(`tests/test_prune_heads.py`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from msvit_tpu.models.base.config import BaseViTConfig


def _find_encoder(tree: Dict[str, Any]) -> Dict[str, Any]:
    """Locate the dict holding the `layer_{i}` entries (handles both a
    raw param tree and the `{"params": ...}` wrapper, and nested trunks)."""
    if "layer_0" in tree:
        return tree
    for v in tree.values():
        if isinstance(v, dict):
            try:
                return _find_encoder(v)
            except KeyError:
                continue
    raise KeyError("no encoder (layer_0) found in param tree")


def _normalize(heads: Mapping[Any, Sequence[int]]) -> Dict[int, list]:
    return {int(i): sorted({int(x) for x in hs}) for i, hs in heads.items()}


def prune_heads(
    params: Dict[str, Any],
    config: BaseViTConfig,
    heads: Mapping[Any, Sequence[int]],
) -> Tuple[Dict[str, Any], BaseViTConfig]:
    """Physically remove heads (HF `prune_heads` surgery).

    `heads` maps layer index -> head indices (into the CURRENT head
    axis).  Every layer of the encoder must be listed with the same
    number of pruned heads — a pruned TPU model still compiles to one
    program per layer shape.  For non-uniform pruning use
    `prune_heads_masked`.  Returns a new (params, config) pair; the
    input tree is not mutated.
    """
    per_layer = _normalize(heads)
    per_layer = {i: hs for i, hs in per_layer.items() if hs}
    if not per_layer:
        return params, config

    h, dh = config.num_attention_heads, config.head_dim
    counts = {len(hs) for hs in per_layer.values()}
    if len(counts) != 1 or set(per_layer) != set(range(config.num_hidden_layers)):
        raise ValueError(
            "prune_heads (surgery mode) needs the SAME number of pruned "
            "heads in EVERY layer (static shapes — one compiled program "
            "per layer).  For non-uniform head sets use "
            "prune_heads_masked, which is numerically identical and "
            "keeps all shapes/shardings intact."
        )
    k = counts.pop()
    for i, hs in per_layer.items():
        if hs[0] < 0 or hs[-1] >= h:
            raise ValueError(f"layer {i}: head index out of range 0..{h - 1}")

    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow-safe copy
    enc = _find_encoder(params)
    for i, hs in per_layer.items():
        keep = np.asarray([j for j in range(h) if j not in hs])
        att = dict(enc[f"layer_{i}"]["attention"])
        att["qkv_kernel"] = jnp.take(att["qkv_kernel"], keep, axis=2)
        if "qkv_bias" in att:
            att["qkv_bias"] = jnp.take(att["qkv_bias"], keep, axis=1)
        od = dict(att["output_dense"])
        rows = (keep[:, None] * dh + np.arange(dh)[None, :]).reshape(-1)
        od["kernel"] = jnp.take(od["kernel"], rows, axis=0)
        att["output_dense"] = od
        enc[f"layer_{i}"] = dict(enc[f"layer_{i}"], attention=att)

    new_config = dataclasses.replace(
        config, num_attention_heads=h - k, attention_head_size=dh
    )
    return params, new_config


def prune_heads_masked(
    params: Dict[str, Any],
    heads: Mapping[Any, Sequence[int]],
) -> Dict[str, Any]:
    """Zero-mask heads: numerically identical to removal, shapes
    unchanged.  Arbitrary per-layer head sets.  Returns a new tree."""
    per_layer = _normalize(heads)
    params = jax.tree_util.tree_map(lambda x: x, params)
    enc = _find_encoder(params)
    for i, hs in per_layer.items():
        if not hs:
            continue
        att = dict(enc[f"layer_{i}"]["attention"])
        qkv = jnp.asarray(att["qkv_kernel"])
        h, dh = qkv.shape[2], qkv.shape[3]
        idx = np.asarray(hs)
        att["qkv_kernel"] = qkv.at[:, :, idx, :].set(0.0)
        if "qkv_bias" in att:
            att["qkv_bias"] = jnp.asarray(att["qkv_bias"]).at[:, idx, :].set(0.0)
        od = dict(att["output_dense"])
        rows = (idx[:, None] * dh + np.arange(dh)[None, :]).reshape(-1)
        od["kernel"] = jnp.asarray(od["kernel"]).at[rows, :].set(0.0)
        att["output_dense"] = od
        enc[f"layer_{i}"] = dict(enc[f"layer_{i}"], attention=att)
    return params
