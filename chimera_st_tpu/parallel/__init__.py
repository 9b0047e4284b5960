from .mesh import initialize_distributed, make_mesh
from .ring_attention import ring_self_attention
from .pipeline import (
    make_layer_stage_fn,
    microbatch,
    pipeline_apply,
    pipelined_layer_stack,
    stack_stage_params,
)
from .partition import (
    param_partition_specs,
    shard_batch,
    shard_params,
    zero1_opt_state_specs,
)

__all__ = [
    "make_mesh",
    "initialize_distributed",
    "param_partition_specs",
    "shard_batch",
    "shard_params",
    "zero1_opt_state_specs",
    "pipeline_apply",
    "pipelined_layer_stack",
    "stack_stage_params",
    "microbatch",
    "make_layer_stage_fn",
]
