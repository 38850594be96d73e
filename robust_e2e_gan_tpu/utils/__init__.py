from robust_e2e_gan_tpu.utils.checkpoint import (
    has_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from robust_e2e_gan_tpu.utils.logging import MetricLogger, StepTimer, profile_trace

__all__ = [
    "has_checkpoint",
    "restore_checkpoint",
    "save_checkpoint",
    "MetricLogger",
    "StepTimer",
    "profile_trace",
]
