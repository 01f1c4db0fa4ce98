"""Subsample encoder — coarse-to-fine quadtree token refinement with a
REINFORCE-trained binary subdivision policy.

TPU-native counterpart of the reference's `model/subsample_encoder/`
(the most complete trainable pipeline upstream, SURVEY §2.7).
"""

from msvit_tpu.models.subsample.config import SubsampleViTConfig  # noqa: F401
from msvit_tpu.models.subsample.model import (  # noqa: F401
    QuadTree,
    SubsampleViTEmbeddings,
    SubsampleViTModel,
    SubsampleViTForImageClassification,
    build_quadtree,
    reinforce_loss,
    subdivide_boxes,
)
