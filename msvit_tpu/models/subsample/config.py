"""Subsample encoder config (reference `configuration_ssvit.py:74-86`)."""

from __future__ import annotations

import dataclasses

from msvit_tpu.models.base.config import BaseViTConfig


@dataclasses.dataclass(frozen=True)
class SubsampleViTConfig(BaseViTConfig):
    # G: the image is initially tiled into G×G boxes
    initial_grid_size: int = 4
    # each subdivided box splits into (mult_grid)×(mult_grid) children
    multiplicative_grid_size: int = 2
    # "open": all tokens stay live; "lock": tokens that decline to split
    # are frozen out of further decisions; "freeze": locked tokens are
    # additionally not re-encoded — their cached per-layer hidden states
    # are fed back as attention context (a KV cache,
    # reference `modeling_ssvit.py:432-459`)
    nesting_mode: str = "open"
    # down-weight deep tokens in attention by depth·(−log g)
    # (reference `modeling_ssvit.py:416-417`)
    use_weighted_tokens: bool = False
    # static refinement depth (the reference passes max_depth to forward;
    # under XLA it is a compile-time constant)
    max_depth: int = 1
    num_labels: int = 1000
    problem_type: str = "single_label_classification"

    @property
    def children_per_split(self) -> int:
        return self.multiplicative_grid_size**2

    @property
    def num_roots(self) -> int:
        return self.initial_grid_size**2

    @property
    def capacity(self) -> int:
        """Fixed token capacity: a full quadtree of depth max_depth —
        replaces the reference's dynamically-growing TensorDict token axis
        (`modeling_ssvit.py:505-520`) with a static, XLA-friendly layout."""
        g = self.children_per_split
        total = 0
        level = self.num_roots
        for _ in range(self.max_depth + 1):
            total += level
            level *= g
        return total
