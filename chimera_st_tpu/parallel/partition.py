"""Parameter/batch partition specs.

Megatron-style tensor parallelism expressed as sharding annotations (the
reference carries a whole model_parallel/ code tree for this,
fairseq/model_parallel/*, 2693 LoC; under XLA SPMD it is a PartitionSpec per
parameter and the compiler inserts the collectives):

- q/k/v projections and fc1 shard their OUTPUT dim on ``model`` (column
  parallel), out_proj and fc2 shard their INPUT dim (row parallel) — the
  all-reduce after out_proj/fc2 is inserted by XLA,
- embeddings/norms/conv kernels are replicated (vocabs here are 10k — tiny),
- optimizer state inherits param specs; with ``zero_sharding='os'`` the
  replicated-param optimizer moments are additionally sharded over ``data``
  on their largest divisible axis (ZeRO-1,
  reference equivalent: fairseq/optim/shard.py via fairscale OSS).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, spec) — first match wins; paths are '/'-joined param paths
TP_RULES = [
    (r"(q_proj|k_proj|v_proj)/kernel$", P(None, "model")),
    (r"(q_proj|k_proj|v_proj)/bias$", P("model")),
    (r"out_proj/kernel$", P("model", None)),
    (r"out_proj/bias$", P(None)),
    (r"fc1/kernel$", P(None, "model")),
    (r"fc1/bias$", P("model")),
    (r"fc2/kernel$", P("model", None)),
    (r"fc2/bias$", P(None)),
]


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def param_partition_specs(params: Any, mesh: Mesh) -> Any:
    """PartitionSpec pytree for params (TP rules when mesh has a model axis;
    pipe rules for scan-over-layers stacks when it has a pipe axis)."""
    use_tp = mesh.shape.get("model", 1) > 1
    n_pipe = mesh.shape.get("pipe", 1)

    def spec_for(path, leaf):
        p = _path_str(path)
        if use_tp:
            for rx, spec in TP_RULES:
                if re.search(rx, p):
                    return spec
        if n_pipe > 1 and "scan_layers" in p:
            # persistently stacked layer params (models/pipeline_lm.py):
            # shard the [L, ...] leading axis over pipe so each device holds
            # ONLY its stage's layers (weights + inherited opt moments)
            if hasattr(leaf, "ndim") and leaf.ndim >= 1 \
                    and leaf.shape[0] % n_pipe == 0:
                return P("pipe")
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def zero1_opt_state_specs(
    opt_state: Any, mesh: Mesh, param_specs: Any = None, tx: Any = None
) -> Any:
    """Shard large optimizer moments over the data axis (ZeRO-1).

    Wired into ``create_train_state(..., zero_sharding='os')``
    (train/train_step.py); the CLI flag is ``--zero-sharding os``
    (reference equivalent: fairseq/optim/shard.py via fairscale OSS).

    When ``tx`` and ``param_specs`` are given, each moment keeps its param's
    TP/pipe spec and gains ``data`` on the first free divisible axis — the
    classic ZeRO-over-TP layout. Without them moments of TP-sharded params
    would get a layout that disagrees with the grads and the updated params,
    making XLA reshard both every step."""
    n_data = mesh.shape.get("data", 1)

    def data_spec(leaf, base=None):
        axes = list(base) if base is not None else []
        if axes and (
            len(axes) > leaf.ndim
            or any(
                a is not None and leaf.shape[i] % mesh.shape[a] != 0
                for i, a in enumerate(axes)
            )
        ):
            # moments that are not param-shaped (adafactor's factored
            # row/col stats reduce one param dim away) cannot inherit the
            # param's TP/pipe spec — fall back to plain data sharding
            axes = []
        axes += [None] * (leaf.ndim - len(axes))
        for i, d in enumerate(leaf.shape):
            if axes[i] is None and d % n_data == 0 and d >= n_data:
                axes[i] = "data"
                break
        if any(a is not None for a in axes):
            return P(*axes)
        return P()

    if tx is not None and param_specs is not None:
        import optax

        try:
            return optax.tree_map_params(
                tx,
                lambda leaf, spec: (
                    P() if not hasattr(leaf, "shape") or leaf.ndim == 0
                    else data_spec(leaf, tuple(spec))
                ),
                opt_state,
                param_specs,
                transform_non_params=lambda leaf: P(),
            )
        except (ValueError, TypeError) as e:
            # optax.tree_map_params cannot traverse some WRAPPED optimizers
            # (e.g. the freeze controls' optax.multi_transform — its inner
            # state flattening trips over the PartitionSpec leaves). Fall
            # back to plain data sharding for the moments: still a valid
            # ZeRO-1 layout, just without TP-spec inheritance (XLA may
            # reshard TP params' moments each step). Review fix:
            # --zero-sharding os + any --fix-* flag used to crash here.
            import logging

            logging.getLogger(__name__).warning(
                "zero1_opt_state_specs: optimizer state not traversable via "
                f"optax.tree_map_params ({type(e).__name__}: {e}); falling "
                "back to data-only moment sharding (no TP-spec inheritance)"
            )

    def spec_for(path, leaf):
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return P()
        return data_spec(leaf)

    return jax.tree_util.tree_map_with_path(spec_for, opt_state)


def shard_params(params: Any, mesh: Mesh, specs: Optional[Any] = None) -> Any:
    if specs is None:
        specs = param_partition_specs(params, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """device_put a batch dict with leading dims sharded over ``data``.

    Leaves whose leading dim does not divide the data axis (or scalars) are
    replicated. This is the single entry point the Trainer and CLIs use to
    place host batches on the mesh (reference equivalent: the per-rank batch
    split done by the dataloader sharding, fairseq/data/iterators.py
    ShardedIterator — under SPMD one process feeds the global batch and XLA
    splits it along the sharded dim)."""
    n_data = mesh.shape.get("data", 1)

    def put(v):
        if v is None:
            # optional leaves (e.g. audio_padding_mask when every crop in the
            # batch has equal length) stay host-side None
            return None
        arr = np.asarray(v) if not hasattr(v, "ndim") else v
        if arr.ndim >= 1 and arr.shape[0] % n_data == 0:
            return jax.device_put(arr, NamedSharding(mesh, P("data")))
        return jax.device_put(arr, NamedSharding(mesh, P()))

    return {k: put(v) for k, v in batch.items()}
