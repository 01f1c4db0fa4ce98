"""Multi-state encoder — hierarchical mid-network token clustering with
cluster-restricted attention mediated by learned transmitter/receiver
tokens (reference `model/multistate_encoder/`, SURVEY §2.3).
"""

from msvit_tpu.models.multistate.config import MultiStateViTConfig  # noqa: F401
from msvit_tpu.models.multistate.model import (  # noqa: F401
    MultiStateViTEncoderBackbone,
    MultiStateViTForImageClassification,
    MultiStateViTEncoderModel,
    build_multistate_attention_mask,
    compress_tokens_with_cluster_indices,
)
from msvit_tpu.models.multistate.quantized import (  # noqa: F401
    calibrate_multistate_act_scales,
    quantize_multistate_params,
    quantized_multistate_apply,
)
