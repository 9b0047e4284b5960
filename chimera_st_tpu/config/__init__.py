from .configs import (
    CommonConfig,
    DatasetConfig,
    OptimizationConfig,
    CheckpointConfig,
    GenerationConfig,
    DistributedConfig,
    ChimeraConfig,
)
from .registry import Registry, REGISTRIES

__all__ = [
    "CommonConfig",
    "DatasetConfig",
    "OptimizationConfig",
    "CheckpointConfig",
    "GenerationConfig",
    "DistributedConfig",
    "ChimeraConfig",
    "Registry",
    "REGISTRIES",
]
