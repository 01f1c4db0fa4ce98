"""Param-layout converters for the scanned trunk (`config.scan_layers`).

The unrolled encoder stores per-layer params as `layer_0 … layer_{L-1}`
(the layout the HF importers, head pruning, and the GPipe stager use);
the scanned encoder stores one stacked subtree `layers` whose leaves
carry a leading depth axis.  These helpers convert between the two, so a
checkpoint imported with `compat.hf_import` runs under `scan_layers=True`
with zero re-download:

    params = import_vit_params(...)                      # layer_{i} layout
    params = stack_layer_params(params)                  # scanned layout
    out = ViTModel(cfg_scan).apply(params, pix)

Both directions are exact pytree transpositions — no dtype or value
changes."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def _find_encoder(tree: Dict[str, Any]):
    """Locate the dict holding `layer_0…`/`layers` (the encoder scope),
    walking the standard {"params": {... "encoder": {...}}} nesting."""
    if "layer_0" in tree or "layers" in tree:
        return tree
    for key in ("params", "encoder"):
        if key in tree and isinstance(tree[key], dict):
            found = _find_encoder(tree[key])
            if found is not None:
                return found
    return None


def stack_layer_params(variables: Dict[str, Any]) -> Dict[str, Any]:
    """`layer_{i}` (unrolled) → `layers` (scanned, leading depth axis)."""
    variables = jax.tree_util.tree_map(lambda x: x, variables)  # deep copy
    enc = _find_encoder(variables)
    if enc is None or "layer_0" not in enc:
        raise ValueError("no unrolled encoder (layer_0…) found")
    depth = 0
    while f"layer_{depth}" in enc:
        depth += 1
    if depth == 0:
        raise ValueError("no unrolled encoder (layer_0…) found")
    per_layer = [enc.pop(f"layer_{i}") for i in range(depth)]
    enc["layers"] = jax.tree.map(
        lambda *xs: jnp.stack(xs, axis=0), *per_layer
    )
    return variables


def unstack_layer_params(variables: Dict[str, Any]) -> Dict[str, Any]:
    """`layers` (scanned) → `layer_{i}` (unrolled / HF-import layout)."""
    variables = jax.tree_util.tree_map(lambda x: x, variables)  # deep copy
    enc = _find_encoder(variables)
    if enc is None or "layers" not in enc:
        raise ValueError("no scanned encoder (layers) found")
    stacked = enc.pop("layers")
    depth = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    for i in range(depth):
        enc[f"layer_{i}"] = jax.tree.map(lambda x: x[i], stacked)
    return variables
