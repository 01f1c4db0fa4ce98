"""Utility layer: math helpers, pytree helpers, misc tools.

TPU-native counterpart of the reference's `infrastructure/utils.py`.
"""

from msvit_tpu.utils.math import (  # noqa: F401
    batch_trace,
    ceildiv,
    gaussian_kl,
    hadamard_conjugation,
    hadamard_conjugation_diff_order1,
    hadamard_conjugation_diff_order2,
    inverse_cubic,
    multiclass_logits,
    pow_series,
    sqrtm,
)
from msvit_tpu.utils.tree import (  # noqa: F401
    flatten_nested_dict,
    hash_config,
    stack_pytrees,
)
from msvit_tpu.utils.misc import Timer, model_size  # noqa: F401
