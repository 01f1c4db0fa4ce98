"""Training layer: optimizer factories, train loops, checkpoint/resume.

The reference has no checkpointing at all (SURVEY §5: no torch.save
anywhere; training scripts run to a hard-coded iteration and throw) —
save/resume here is new capability, built on orbax.
"""

from msvit_tpu.train.checkpoint import (  # noqa: F401
    CheckpointManager,
    restore_checkpoint,
    save_checkpoint,
)
from msvit_tpu.train.loop import TrainState, make_optimizer, train_step_fn  # noqa: F401
from msvit_tpu.train.trainer import Trainer  # noqa: F401
