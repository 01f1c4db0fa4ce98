"""Saccadic config (reference `configuration_scvit.py:85-141`)."""

from __future__ import annotations

import dataclasses
from typing import Tuple

from msvit_tpu.models.base.config import BaseViTConfig

PATCH_CONFIG_DOF = {
    "translation": 2,
    "scaling": 3,
    "non-uniform-scaling": 4,
}


@dataclasses.dataclass(frozen=True)
class SaccadicViTConfig(BaseViTConfig):
    # ((complexity, num_patterns), ...) — the reference's
    # num_patterns = {1: 1024, 2: 1024} as a hashable tuple
    num_patterns: Tuple[Tuple[int, int], ...] = ((1, 1024), (2, 1024))
    covariance_dim: int = 64  # low-rank covariance factor width
    # the reference defaults this to +inf (pure low-rank covariance limit);
    # finite values give a proper density
    log_covariance_shift: float = 0.0
    beam_size: int = 64
    # matcher decomposition: "chol" (Cholesky–Woodbury, all direct
    # triangular ops — the TPU fast path) or "eigh" (Gram eigendecomposition,
    # mirrors the reference's SVD route `modeling_predictor.py:128-146`).
    # Mathematically identical up to a per-slot rotation of the factor
    # basis that cancels in every consumer (see pattern.py docstring).
    matcher_solver: str = "chol"
    refiner_implementation: str = "transformer"
    # refiner attention: "eager" (standard MHSA) or "quadratic"
    # (linear QKᵀ − ½‖dist(q)−dist(k)‖², reference
    # `modeling_quadratic_attention.py:13-76`)
    refiner_attention: str = "quadratic"

    image_size: int = 448
    patch_size: int = 128  # glimpse resolution
    patch_config: str = "translation"
    pe_bias: bool = True

    @property
    def dof(self) -> int:
        return PATCH_CONFIG_DOF[self.patch_config]

    @property
    def num_patterns_dict(self):
        return dict(self.num_patterns)

    @property
    def max_complexity(self) -> int:
        return max(k for k, _ in self.num_patterns)
