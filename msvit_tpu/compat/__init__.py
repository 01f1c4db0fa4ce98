"""PyTorch / HuggingFace interop: import pretrained checkpoints into
msvit_tpu param pytrees (the TPU-native equivalent of the reference's
`from_pretrained` + partial `load_state_dict` bootstrap,
reference `modeling_msvitencoder.py:681-690`, `modeling_ssvit.py:235-249`).
"""

from msvit_tpu.compat.hf_import import (  # noqa: F401
    import_vit_params,
    load_torch_state_dict,
)
from msvit_tpu.compat.family_import import (  # noqa: F401
    import_into_multistate,
    import_into_predictive,
    import_into_subsample,
    transfer_base_to_multistate,
    transfer_base_to_subsample,
)
from msvit_tpu.compat.pretrained import (  # noqa: F401
    config_from_hf,
    load_pretrained_vit,
    load_state_dict_from,
    resolve_checkpoint,
)
