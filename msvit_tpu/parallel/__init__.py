"""Parallelism layer: device meshes, sharding rules, pjit train steps.

The reference has **no** distributed support (SURVEY §2.10: single process,
cuda:0, no torch.distributed).  Here parallelism is first-class and
TPU-native: a `jax.sharding.Mesh` over ICI with data-parallel batch
sharding by default and tensor-parallel sharding of attention heads / MLP
hidden for larger configs; XLA inserts the collectives (psum/all-gather)
from the `PartitionSpec` annotations — no explicit communication code.
"""

from msvit_tpu.parallel.mesh import make_mesh  # noqa: F401
from msvit_tpu.parallel.pipeline_vit import (  # noqa: F401
    init_pipelined_classifier,
    make_pipelined_classifier_apply,
    make_pipelined_loss_fn,
    pipeline_params_from_full,
    shard_pipeline_params,
)
from msvit_tpu.parallel.ring_attention import ring_attention  # noqa: F401
from msvit_tpu.parallel.sharding import (  # noqa: F401
    partition_spec_for_params,
    shard_params,
)
from msvit_tpu.parallel import distributed  # noqa: F401
