"""Predictive encoder configs (reference `configuration_spvit.py:29-96`,
`configuration_training.py:28-57`)."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from msvit_tpu.models.base.config import BaseViTConfig

# degrees of freedom per glimpse parameterization
# (reference `modeling_spvitencoder.py:68-76`)
PATCH_CONFIG_DOF = {
    "translation": 2,
    "scaling": 3,
    "non-uniform-scaling": 4,
}


@dataclasses.dataclass(frozen=True)
class PredictiveViTConfig(BaseViTConfig):
    use_cls_token: bool = True
    image_size: int = 224
    patch_size: int = 64  # glimpse resolution, not a tiling patch
    patch_config: str = "scaling"
    default_patch_scale: float = 0.5
    patch_config_distribution: str = "uniform"
    # scalar, or per-dof (scale, shift) rows; stored as a tuple of tuples
    # for hashability (reference accepts scalar | tensor [dof, 2])
    patch_config_scale: object = 1.0
    pe_bias: bool = False
    expected_context_length: float = 2.0
    # static upper bound on the geometric context length — XLA needs a
    # static token axis; the reference sizes it per-batch dynamically
    # (`modeling_spvitencoder.py:672-673`), we clamp to this bound
    max_context_length: int = 8

    @property
    def dof(self) -> int:
        return PATCH_CONFIG_DOF[self.patch_config]

    @property
    def seq_length(self) -> int:
        # [CLS, ctx_1..ctx_max, PRD]
        return self.max_context_length + 2


@dataclasses.dataclass(frozen=True)
class PredictiveViTTrainingConfig:
    """Loss weights (reference `configuration_training.py:28-57`)."""

    preservation: float = 0.0
    context_prediction: float = 0.0
    query_prediction: float = 0.0
    context_patch_prediction: float = 0.0
    query_patch_prediction: float = 0.0
    positional_recovery: float = 0.0
    positional_regularization: float = 0.0
    # Deviation knob (r5, VERDICT r4 item 7; no reference counterpart —
    # the reference weights only patch losses, so its latent losses are
    # reported raw): divide the three latent-space losses (preservation,
    # context/query prediction) by the stop-gradient mean second moment
    # of the input embeddings, making them scale-invariant — without
    # this they track the growing embedding norm (r4 all7 run:
    # preservation 216→359 while the model improved).
    normalize_latent: bool = False
