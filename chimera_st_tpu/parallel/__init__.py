from .mesh import initialize_distributed, make_mesh
from .partition import (
    batch_sharding,
    param_partition_specs,
    shard_batch,
    shard_params,
    zero1_opt_state_specs,
)

__all__ = [
    "make_mesh",
    "initialize_distributed",
    "param_partition_specs",
    "batch_sharding",
    "shard_batch",
    "shard_params",
    "zero1_opt_state_specs",
]
