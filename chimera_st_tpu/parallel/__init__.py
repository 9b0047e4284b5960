from .mesh import make_mesh
from .partition import batch_sharding, param_partition_specs, shard_params

__all__ = ["make_mesh", "param_partition_specs", "batch_sharding", "shard_params"]
