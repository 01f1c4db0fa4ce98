"""Base ViT trunk — the shared transformer encoder every family builds on.

TPU-native counterpart of `model/base_encoder/` in the reference:
pre-LN ViT blocks with cross-context K/V attention, bool/additive masks,
DINOv2 layer-scale, stochastic depth, and GELU-MLP / SwiGLU FFN options.
"""

from msvit_tpu.models.base.config import BaseViTConfig  # noqa: F401
from msvit_tpu.models.base.model import (  # noqa: F401
    BaseViTEncoder,
    BaseViTLayer,
    BaseViTSelfAttention,
)
from msvit_tpu.models.base.vit import ViTModel, ViTEmbeddings  # noqa: F401
from msvit_tpu.models.base.pruning import (  # noqa: F401
    prune_heads,
    prune_heads_masked,
)
