from .lr_schedulers import build_lr_schedule
from .optimizers import build_optimizer

__all__ = ["build_lr_schedule", "build_optimizer"]
