"""Saccadic encoder — serial foveated "saccades" over an image, matching
learned Gaussian-mixture patterns via beam search, with a transformer
refiner (reference `model/saccadic_encoder/`, SURVEY §2.6 — the top-level
model loop is unfinished upstream; implemented here per `design.txt` and
the `modeling_scvitencoder.py:348-487` sketch).
"""

from msvit_tpu.models.saccadic.config import SaccadicViTConfig  # noqa: F401
from msvit_tpu.models.saccadic.embeddings import (  # noqa: F401
    SaccadicViTEmbeddings,
)
from msvit_tpu.models.saccadic.pattern import (  # noqa: F401
    SaccadicViTMultiStatePattern,
    gaussian_low_rank_log_pdf,
)
from msvit_tpu.models.saccadic.refiner import (  # noqa: F401
    SaccadicViTEncoder,
    TransformerSaccadicViTPredictor,
)
from msvit_tpu.models.saccadic.model import SaccadicViTModel  # noqa: F401
from msvit_tpu.models.saccadic.batched import batched_saccade_run  # noqa: F401
