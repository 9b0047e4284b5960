"""Pipeline parallelism over a mesh axis (GPipe schedule, TPU-native).

Reference capability: fairscale-Pipe pipeline model parallelism —
`pipeline_parallel_transformer` (reference:
fairseq/model_parallel/models/pipeline_parallel_transformer/model.py:44-120,
flags --pipeline-balance/--pipeline-devices/--pipeline-chunks/
--pipeline-checkpoint) and the process-group plumbing in
fairseq/distributed_utils.py:36-75,153. The reference moves module shards
between GPUs with RPC and replays microbatches through torch autograd.

The TPU-native design is a single SPMD program instead:

- the layer stack's params are STACKED on a leading ``[n_stages,
  layers_per_stage, ...]`` axis and sharded over a ``pipe`` mesh axis, so
  each device holds exactly its stage's layers (the reference's
  ``--pipeline-balance`` corresponds to ``layers_per_stage``; only uniform
  balance is supported — XLA needs one homogeneous program per device),
- a ``lax.scan`` over ``num_microbatches + n_stages - 1`` ticks runs the
  GPipe schedule: every tick each stage applies its layers to the
  activation that reached it, then a non-cyclic ``lax.ppermute`` shifts
  activations one stage forward over ICI (stage 0 feeds the next
  microbatch; devices with no inbound edge receive zeros, which is exactly
  the GPipe bubble),
- outputs are emitted by the last stage and broadcast with a masked
  ``psum`` — zeros everywhere else make the sum the identity,
- reverse-mode AD flows through scan/ppermute/psum, so ``jax.grad`` of a
  loss on the pipeline output produces correct per-stage grads with the
  full-activation-stash GPipe memory profile; pass ``remat=True`` to
  rematerialize each stage in the backward pass instead (the reference's
  ``--pipeline-checkpoint except_last``).

``num_microbatches`` is the reference's ``--pipeline-chunks``. The bubble
fraction is ``(n_stages - 1) / (num_microbatches + n_stages - 1)``; pick
chunks >= 4x stages for >80% pipeline utilisation.

Two scope notes:

- PERSISTENT params stay in their per-layer subtrees (replicated over the
  mesh); the stage-stacked copy exists only inside the step, where XLA
  shards it over ``pipe``. This keeps optimizer/checkpoint layouts
  identical with and without the pipeline, at the cost of not reducing
  per-device HBM for the weights — the flagship models fit one chip many
  times over, so this build pipelines for THROUGHPUT composition, not
  capacity. Capacity-PP would store the stack as a scanned ``[L, ...]``
  param tree sharded over ``pipe`` (documented delta; the reference's Pipe
  moves module shards between devices and rewrites the state dict,
  model.py:336 convert_to_pipeline_parallel_state_dict).
- ``pipeline_apply`` jits a fresh shard_map closure per call: callers must
  sit inside an enclosing jit (the train step does) or accept a retrace
  per invocation.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def stack_stage_params(per_layer_params: Sequence[Any], n_stages: int) -> Any:
    """[L layer pytrees] -> one pytree with leading [n_stages, L/n_stages].

    The layers must be homogeneous (same param shapes), as in a transformer
    encoder/decoder stack. Layer order is preserved: stage s owns layers
    ``s*L/n .. (s+1)*L/n - 1``.
    """
    n_layers = len(per_layer_params)
    if n_layers % n_stages != 0:
        raise ValueError(
            f"{n_layers} layers do not divide into {n_stages} equal stages "
            "(only uniform --pipeline-balance is supported)"
        )
    per = n_layers // n_stages
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *per_layer_params
    )
    return jax.tree_util.tree_map(
        lambda x: x.reshape((n_stages, per) + x.shape[1:]), stacked
    )


def microbatch(x: jax.Array, num_microbatches: int) -> jax.Array:
    """[B, ...] -> [num_microbatches, B/num_microbatches, ...]."""
    b = x.shape[0]
    if b % num_microbatches != 0:
        raise ValueError(f"batch {b} does not divide into {num_microbatches}")
    return x.reshape((num_microbatches, b // num_microbatches) + x.shape[1:])


def make_layer_stage_fn(
    layer_apply: Callable[..., jax.Array],
) -> Callable[..., jax.Array]:
    """Lift a single-layer apply into a stage fn scanning layers_per_stage.

    ``layer_apply(layer_params, x, *extras) -> x`` becomes
    ``stage_fn(stage_params, x, *extras) -> x`` where stage_params has a
    leading [layers_per_stage] axis.
    """

    def stage_fn(stage_params, x, *extras):
        def body(h, p):
            return layer_apply(p, h, *extras), None

        h, _ = lax.scan(body, x, stage_params)
        return h

    return stage_fn


def pipeline_apply(
    stage_fn: Callable[..., jax.Array],
    stacked_params: Any,
    microbatches: jax.Array,
    extras: Sequence[jax.Array] = (),
    *,
    mesh: Mesh,
    axis: str = "pipe",
    batch_axis: Optional[str] = None,
    remat: bool = False,
) -> jax.Array:
    """Run the GPipe schedule for one layer stack over ``mesh[axis]``.

    Args:
      stage_fn: ``(stage_params, x, *extras_t) -> x`` applied by every stage
        (stage_params: this stage's slice, leading [layers_per_stage]).
        Must preserve x's shape (pipeline stages are shape-homogeneous).
      stacked_params: leading [n_stages, layers_per_stage, ...] pytree.
      microbatches: [num_micro, mb, ...] activations entering stage 0.
      extras: per-microbatch side inputs every stage needs (e.g. padding
        masks), each [num_micro, mb, ...]; stage s at tick t indexes its own
        microbatch t - s.
      batch_axis: optional mesh axis name to shard the microbatch dim over
        (composes dp x pp on a ('data', 'pipe') mesh).
      remat: rematerialize stage_fn in the backward pass
        (reference --pipeline-checkpoint).

    Returns [num_micro, mb, ...] outputs, replicated over ``axis``.
    """
    n_stages = mesh.shape[axis]
    num_micro = microbatches.shape[0]
    ticks = num_micro + n_stages - 1
    if remat:
        stage_fn = jax.checkpoint(stage_fn)

    dspec = (None, batch_axis) if batch_axis else (None,)
    x_spec = P(*dspec)
    param_spec = jax.tree_util.tree_map(lambda _: P(axis), stacked_params)

    def per_device(params_local, mb_local, *extras_local):
        # local param shard: leading dim 1 (this device's stage)
        stage_params = jax.tree_util.tree_map(lambda p: p[0], params_local)
        stage = lax.axis_index(axis)

        def pick(arr, tick):
            # the microbatch index this stage works on at this tick
            idx = jnp.clip(tick - stage, 0, num_micro - 1)
            return lax.dynamic_index_in_dim(arr, idx, keepdims=False)

        fwd = [(i, i + 1) for i in range(n_stages - 1)]  # non-cyclic shift

        def tick_fn(carry, t):
            # stage 0 reads fresh input; others use what ppermute delivered
            inbound = carry
            fresh = pick(mb_local, t)
            x = jnp.where(stage == 0, fresh, inbound)
            ex = [pick(e, t) for e in extras_local]
            out = stage_fn(stage_params, x, *ex)
            nxt = lax.ppermute(out, axis, fwd)
            emit = jnp.where(stage == n_stages - 1, out, jnp.zeros_like(out))
            return nxt, emit

        zero = jnp.zeros_like(mb_local[0])
        _, emits = lax.scan(tick_fn, zero, jnp.arange(ticks))
        # last stage finishes microbatch m at tick m + n_stages - 1
        outs = emits[n_stages - 1 :]
        # masked psum == broadcast of the last stage's values
        return lax.psum(outs, axis)

    mapped = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(param_spec, x_spec) + tuple(x_spec for _ in extras),
        out_specs=x_spec,
        check_vma=False,
    )
    # jit is required: scan/remat inside shard_map cannot run eagerly
    return jax.jit(mapped)(stacked_params, microbatches, *extras)


def pipeline_bubble_fraction(n_stages: int, num_microbatches: int) -> float:
    """Idle fraction of the GPipe schedule (documentation helper)."""
    return (n_stages - 1) / (num_microbatches + n_stages - 1)


def pipelined_layer_stack(
    per_layer_params: Sequence[Any],
    layer_apply: Callable[..., jax.Array],
    x: jax.Array,  # [B, ...]
    extras: Sequence[jax.Array] = (),
    *,
    mesh: Mesh,
    stages: int,
    chunks: int = 0,
    remat: bool = False,
) -> Optional[jax.Array]:
    """One-call wrapper the models use: stack per-layer params, microbatch
    the batch dim, pick the data axis, run the schedule, restore the shape.

    Returns None when the batch is not divisible into ``chunks``
    microbatches (ragged tail batches from token-budget batching) — the
    caller falls back to the plain sequential layer loop for that shape.

    ``per_layer_params`` is either a list of per-layer param trees (stacked
    here at trace time) or an already-stacked tree with a leading ``[L]``
    axis (the persistent scan-over-layers layout of
    models/pipeline_lm.py, which a ``P('pipe')`` spec shards for real
    per-device stage residency).
    """
    chunks = chunks or stages
    b = x.shape[0]
    if b % chunks != 0:
        return None
    if isinstance(per_layer_params, (list, tuple)):
        stacked = stack_stage_params(per_layer_params, stages)
    else:  # [L, ...] tree -> [stages, L/stages, ...]
        n_layers = jax.tree_util.tree_leaves(per_layer_params)[0].shape[0]
        if n_layers % stages != 0:
            raise ValueError(f"{n_layers} layers / {stages} stages uneven")
        per = n_layers // stages
        stacked = jax.tree_util.tree_map(
            lambda a: a.reshape((stages, per) + a.shape[1:]),
            per_layer_params,
        )
    n_data = mesh.shape.get("data", 1)
    batch_axis = "data" if n_data > 1 and (b // chunks) % n_data == 0 else None
    out = pipeline_apply(
        make_layer_stage_fn(layer_apply),
        stacked,
        microbatch(x, chunks),
        extras=tuple(microbatch(e, chunks) for e in extras),
        mesh=mesh,
        batch_axis=batch_axis,
        remat=remat,
    )
    return out.reshape(x.shape)
