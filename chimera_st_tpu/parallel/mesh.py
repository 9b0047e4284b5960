"""Device mesh construction.

TPU-native replacement for the reference's process-group / DDP world
(reference: fairseq/distributed_utils.py:200-340): one jit'ed SPMD program
over a `jax.sharding.Mesh` with axes

- ``data``  — batch (data parallel; grad all-reduce rides ICI, inserted by XLA),
- ``model`` — tensor parallel (Megatron-style shardings are PartitionSpecs
  here, replacing the reference's model_parallel/ module tree, which in the
  reference depends on a missing megatron submodule).

Multi-host: call `initialize_distributed` per host (replaces SLURM/env://
init-method inference, reference: distributed_utils.py:32-197).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    data_parallel: int = -1,
    model_parallel: int = 1,
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data_parallel == -1:
        assert n % model_parallel == 0, (n, model_parallel)
        data_parallel = n // model_parallel
    assert data_parallel * model_parallel <= n, (
        f"mesh {data_parallel}x{model_parallel} needs more than {n} devices"
    )
    used = devices[: data_parallel * model_parallel]
    arr = np.asarray(used).reshape(data_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def make_pipeline_mesh(
    pipeline_stages: int,
    data_parallel: int = -1,
    devices=None,
) -> Mesh:
    """(data x pipe) mesh for pipeline-parallel training
    (parallel/pipeline.py; reference flags: --pipeline-devices)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % pipeline_stages == 0, (
        f"{n} devices do not divide into {pipeline_stages} pipeline stages"
    )
    if data_parallel == -1:
        data_parallel = n // pipeline_stages
    assert data_parallel * pipeline_stages <= n, (
        f"mesh {data_parallel}x{pipeline_stages} (data x pipe) needs more "
        f"than {n} devices"
    )
    used = devices[: data_parallel * pipeline_stages]
    arr = np.asarray(used).reshape(data_parallel, pipeline_stages)
    return Mesh(arr, ("data", "pipe"))


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host runtime init (no-op on single host)."""
    if coordinator_address is None:
        return
    if (num_processes is None) != (process_id is None):
        raise RuntimeError(
            "give --distributed-rank and --distributed-num-procs together, "
            "or neither (both are auto-detected on TPU pods); got "
            f"rank={process_id} num_procs={num_processes}"
        )
    try:  # private probe, best-effort: jax._src has no stability guarantee,
        # and this fail-fast nicety must never itself break init on a jax
        # upgrade — fall through to jax.distributed.initialize's own error
        from jax._src import xla_bridge

        already = xla_bridge.backends_are_initialized()
    except (ImportError, AttributeError):
        already = False
    if already:
        raise RuntimeError(
            "the JAX backend is already initialized — "
            "initialize_distributed() must run before the first "
            "jax.devices()/computation in the process (the CLIs do this "
            "during argument parsing; a custom harness must call it first)"
        )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
