"""Predictive encoder — variable-length sequences of affine-transformed
glimpse patches; the transformer predicts embeddings/patches at predicted
locations (JEPA/MAE-flavored).

TPU-native counterpart of the reference's `model/predictive_encoder/`
(the complete + trainable family, SURVEY §2.5).
"""

from msvit_tpu.models.predictive.config import (  # noqa: F401
    PATCH_CONFIG_DOF,
    PredictiveViTConfig,
    PredictiveViTTrainingConfig,
)
from msvit_tpu.models.predictive.model import PredictiveViTModel  # noqa: F401
from msvit_tpu.models.predictive.losses import (  # noqa: F401
    LOSS2FN,
    training_loss,
)
