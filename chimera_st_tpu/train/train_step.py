"""jit-compiled training step — the single source of truth for step semantics.

TPU-native replacement for the reference's Trainer.train_step inner loop
(reference: fairseq/trainer.py:455-668):

- `make_microbatch_grad_fn` — gradients for ONE microbatch (the reference's
  per-sample task.train_step + optimizer.backward, trainer.py:479-500),
- `make_apply_gradients` — normalize by TOTAL sample size, global-norm
  logging, non-finite skip, optimizer update (the reference's
  multiply_grads(world/sample_size) + clip + NanDetector/overflow handling,
  trainer.py:601-668). Skipped (non-finite) updates do not advance the step
  counter, keeping the LR schedule aligned with applied updates,
- `make_train_step` — a fully-jitted step with grad accumulation as a
  `lax.scan` over a leading microbatch axis (used when all microbatches share
  one shape bucket: dryrun, tests, benchmark loops),
- the `Trainer` (trainer.py) composes the SAME two primitives with one jit
  per shape bucket for ragged real-data batches.

Under SPMD the cross-worker gradient sum is implicit in the sharded batch
dimensions; optimizer-state sharding (ZeRO-1, reference: fairseq/optim/shard.py
via fairscale OSS) is a PartitionSpec on the opt-state pytree applied in
`create_train_state` and re-asserted after each update via
with_sharding_constraint.

bf16 compute with fp32 params — no loss scaler (delta vs the reference's
FP16Optimizer: bf16 has fp32's exponent range so the DynamicLossScaler state
machine is unnecessary).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    step: jax.Array  # scalar int32
    params: Any
    opt_state: Any


def create_train_state(
    params: Any,
    tx: optax.GradientTransformation,
    mesh=None,
    zero_sharding: Optional[str] = None,
) -> TrainState:
    """Init optimizer state; with ``zero_sharding='os'`` shard the large
    replicated optimizer moments over the mesh's data axis (ZeRO-1)."""
    opt_state = tx.init(params)
    if mesh is not None and zero_sharding == "os" and mesh.shape.get("data", 1) > 1:
        from jax.sharding import NamedSharding, PartitionSpec

        from ..parallel.partition import zero1_opt_state_specs

        # each moment inherits its param's TP/pipe spec (read off the placed
        # params) plus `data` on a free axis — grads/moments/params then agree
        # and the update step needs no per-step resharding
        param_specs = jax.tree_util.tree_map(
            lambda p: (
                p.sharding.spec
                if isinstance(getattr(p, "sharding", None), NamedSharding)
                else PartitionSpec()
            ),
            params,
        )
        specs = zero1_opt_state_specs(opt_state, mesh, param_specs, tx)
        opt_state = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), opt_state, specs
        )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
    )


def global_norm(tree) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves)
    )


def prepare_batch(batch: Dict) -> Dict:
    """Undo the host-wire economy format ON DEVICE (free: both ops fuse into
    the first consumer). Counterpart of data/manifests.py set_wire_format:

    - int16 waveforms -> float32 / 32768 (the exact normalization
      data/audio.py read_wav applies on the float path — lossless for the
      PCM16 sources MuST-C ships),
    - a missing ``audio_padding_mask`` is rebuilt from ``audio_lengths``
      (pos >= length), sparing the host a [B, T] bool build + transfer.

    Batches that never went through the wire format pass through unchanged,
    so validate/decode paths can share the same jitted functions."""
    b = dict(batch)
    a = b.get("audio")
    if a is not None and a.dtype == jnp.int16:
        b["audio"] = a.astype(jnp.float32) / 32768.0
    if (
        a is not None
        and b.get("audio_padding_mask") is None
        and b.get("audio_lengths") is not None
    ):
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, a.shape[1]), 1)
        b["audio_padding_mask"] = pos >= b["audio_lengths"][:, None].astype(
            jnp.int32
        )
    return b


def make_microbatch_grad_fn(model, criterion: Callable, task_name=None):
    """(params, batch, rng, step) -> (grads, sample_size fp32, logging dict).

    `task_name` is a static tag: joint-task criterion dispatch happens at
    trace time, one compiled step per sub-task.
    """

    def grad_fn(params, batch, rng, step):
        batch = prepare_batch(batch)

        def loss_for_grad(p):
            b = dict(batch)
            if task_name is not None:
                b["task_name"] = task_name
            loss, ss, logging = criterion(
                model, p, b, rngs={"dropout": rng}, num_updates=step, train=True
            )
            logging = {
                k: v for k, v in logging.items() if not isinstance(v, str)
            }
            return loss, (ss, logging)

        (_, (ss, logging)), grads = jax.value_and_grad(
            loss_for_grad, has_aux=True
        )(params)
        return grads, jnp.asarray(ss, jnp.float32), logging

    return grad_fn


def make_apply_gradients(
    tx: optax.GradientTransformation,
    skip_nonfinite: bool = True,
    opt_state_shardings: Any = None,
    return_leaf_finite: bool = False,
):
    """(state, grads, sample_size) -> (new_state, gnorm, finite[, leaf_finite]).

    ``return_leaf_finite`` additionally returns a grads-shaped tree of scalar
    bools (per-leaf all-finite flags), computed INSIDE the jitted step so the
    skip-path diagnosis never touches the donated grad buffers (review fix:
    reading `grads` after `donate_argnums=(0, 1)` raises 'Array has been
    deleted' on TPU — exactly on the non-finite event it diagnoses)."""

    def apply_fn(state: TrainState, grads, sample_size):
        grads = jax.tree_util.tree_map(
            lambda g: g / jnp.maximum(sample_size, 1.0), grads
        )
        leaf_finite = (
            jax.tree_util.tree_map(lambda g: jnp.isfinite(g).all(), grads)
            if return_leaf_finite else None
        )
        gnorm = global_norm(grads)
        finite = jnp.isfinite(gnorm)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if skip_nonfinite:
            keep = lambda new, old: jax.tree_util.tree_map(
                lambda a, b: jnp.where(finite, a, b), new, old
            )
            new_params = keep(new_params, state.params)
            new_opt = keep(new_opt, state.opt_state)
            new_step = state.step + finite.astype(state.step.dtype)
        else:
            new_step = state.step + 1
        if opt_state_shardings is not None:
            new_opt = jax.lax.with_sharding_constraint(
                new_opt, opt_state_shardings
            )
        out = TrainState(new_step, new_params, new_opt)
        if return_leaf_finite:
            return out, gnorm, finite, leaf_finite
        return out, gnorm, finite

    return apply_fn


def make_train_step(
    model,
    criterion: Callable,
    tx: optax.GradientTransformation,
    accum_steps: int = 1,
    lr_schedule: Optional[Callable] = None,
    donate: bool = True,
    skip_nonfinite: bool = True,
    opt_state_shardings: Any = None,
):
    """Returns step(state, batch, rng) -> (state, metrics), fully jitted.

    With ``accum_steps > 1``, every batch leaf must have a leading
    [accum_steps, ...] microbatch axis (grad accumulation via lax.scan,
    replacing the reference's Python loop with no_sync on all but the last
    microbatch, trainer.py:479-500).
    """
    single_micro = make_microbatch_grad_fn(model, criterion)
    apply_fn = make_apply_gradients(
        tx, skip_nonfinite=skip_nonfinite, opt_state_shardings=opt_state_shardings
    )

    def accumulated(params, batch, rng, step):
        def body(carry, micro):
            acc_grads, acc_ss, acc_log, i = carry
            g, ss, logging = single_micro(
                params, micro, jax.random.fold_in(rng, i), step
            )
            acc_grads = jax.tree_util.tree_map(jnp.add, acc_grads, g)
            acc_log = jax.tree_util.tree_map(jnp.add, acc_log, logging)
            return (acc_grads, acc_ss + ss, acc_log, i + 1), None

        micro0 = jax.tree_util.tree_map(lambda x: x[0], batch)
        g0, ss0, log0 = single_micro(params, micro0, jax.random.fold_in(rng, 0), step)
        rest = jax.tree_util.tree_map(lambda x: x[1:], batch)
        (grads, ss, logging, _), _ = jax.lax.scan(body, (g0, ss0, log0, 1), rest)
        return grads, ss, logging

    def step_fn(state: TrainState, batch: Dict, rng: jax.Array):
        params = state.params
        if accum_steps > 1:
            grads, sample_size, logging = accumulated(params, batch, rng, state.step)
        else:
            grads, sample_size, logging = single_micro(params, batch, rng, state.step)
        new_state, gnorm, finite = apply_fn(state, grads, sample_size)
        metrics = dict(logging)
        metrics["gnorm"] = gnorm
        metrics["sample_size_total"] = sample_size
        metrics["nonfinite_grad"] = 1.0 - finite.astype(jnp.float32)
        if lr_schedule is not None:
            metrics["lr"] = lr_schedule(state.step)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_valid_step(model, criterion: Callable):
    def step_fn(params, batch):
        loss, sample_size, logging = criterion(
            model, params, prepare_batch(batch), rngs=None, num_updates=None,
            train=False,
        )
        return logging

    return jax.jit(step_fn)
