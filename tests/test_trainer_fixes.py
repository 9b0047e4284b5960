"""Regression tests for the trainer/LR-schedule review fixes: donated-grads
diagnosis, plateau polarity, scheduler state persistence, scheduler
hyperparam reachability, restore device placement."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from chimera_st_tpu.optim.lr_schedulers import build_lr_schedule
from chimera_st_tpu.train.train_step import (
    TrainState,
    make_apply_gradients,
)
from chimera_st_tpu.train.trainer import nonfinite_paths_from_flags


@pytest.mark.quick
def test_nonfinite_diagnosis_without_touching_grads():
    """The per-leaf finite flags come OUT of the jitted apply step, so the
    skip-path naming never dereferences the (donated) grad buffers."""
    tx = optax.sgd(1e-2)
    params = {"enc": {"w": jnp.ones(3)}, "dec": {"w": jnp.ones(2)}}
    state = TrainState(jnp.asarray(0), params, tx.init(params))
    apply_fn = jax.jit(
        make_apply_gradients(tx, skip_nonfinite=True, return_leaf_finite=True),
        donate_argnums=(0, 1),
    )
    grads = {"enc": {"w": jnp.asarray([1.0, jnp.nan, 2.0])},
             "dec": {"w": jnp.zeros(2)}}
    new_state, gnorm, finite, leaf_finite = apply_fn(
        state, grads, jnp.asarray(1.0)
    )
    assert not bool(finite)
    # grads buffers may be deleted now; flags alone must name the culprits
    assert nonfinite_paths_from_flags(leaf_finite) == ["enc/w"]
    # the skip left params untouched and did not advance the step
    np.testing.assert_array_equal(np.asarray(new_state.params["dec"]["w"]),
                                  np.ones(2))
    assert int(new_state.step) == 0


@pytest.mark.quick
def test_plateau_respects_maximize_polarity():
    """reduce_lr_on_plateau with a maximize metric (BLEU) must NOT shrink
    while the metric improves (review fix: polarity never reached the
    scheduler, so improving BLEU shrank the LR every validation)."""
    sched = build_lr_schedule({
        "_name": "reduce_lr_on_plateau", "lr": 1.0, "lr_shrink": 0.1,
        "lr_patience": 0, "maximize_best_checkpoint_metric": True,
    })
    assert float(sched(0)) == 1.0
    assert sched.step_val(10.0) is False
    assert sched.step_val(15.0) is False  # improving: no shrink
    assert float(sched(0)) == 1.0
    assert sched.step_val(14.0) is True   # regressed: shrink
    assert float(sched(0)) == pytest.approx(0.1)

    # state round-trip restores the shrunk scale (resume used to reset it)
    blob = sched.state_dict()
    fresh = build_lr_schedule({
        "_name": "reduce_lr_on_plateau", "lr": 1.0, "lr_shrink": 0.1,
        "lr_patience": 0, "maximize_best_checkpoint_metric": True,
    })
    assert float(fresh(0)) == 1.0
    fresh.load_state_dict(blob)
    assert float(fresh(0)) == pytest.approx(0.1)


@pytest.mark.quick
def test_scheduler_hyperparams_reachable():
    """polynomial honors total_num_update; tri_stage refuses max_update 0."""
    sched = build_lr_schedule({
        "_name": "polynomial_decay", "lr": 1.0, "warmup_updates": 0,
        "total_num_update": 100, "end_learning_rate": 0.0, "power": 1.0,
    })
    assert float(sched(100)) == pytest.approx(0.0, abs=1e-6)
    assert float(sched(50)) == pytest.approx(0.5, abs=1e-6)

    with pytest.raises(ValueError):
        build_lr_schedule({"_name": "tri_stage", "lr": 5e-4, "max_update": 0})


@pytest.mark.quick
def test_warmup_init_sentinel_never_negative():
    """The CLI always passes the fairseq warmup_init_lr=-1 sentinel; every
    warmup-capable schedule must resolve it, not warm up from lr=-1
    (review fix: cosine/fixed/plateau took it literally, training with a
    NEGATIVE LR through most of warmup)."""
    for name, extra in (
        ("fixed", {}),
        ("inverse_sqrt", {}),
        ("cosine", {"max_lr": 2e-3, "lr_period_updates": 1000}),
        ("reduce_lr_on_plateau", {}),
    ):
        sched = build_lr_schedule({
            "_name": name, "lr": 1e-3, "warmup_updates": 100,
            "warmup_init_lr": -1.0, **extra,
        })
        for step in (0, 1, 50, 99, 100, 500):
            lr = float(sched(step))
            assert lr >= 0.0, f"{name} lr({step}) = {lr}"


@pytest.mark.quick
def test_cosine_restarts_with_shrink():
    """Cosine is cyclical with warm restarts (reference
    cosine_lr_scheduler.py): after each lr_period_updates the schedule
    restarts, shrunk by lr_shrink**i — it must NOT stick at the floor
    forever after one half-cycle (review fix)."""
    sched = build_lr_schedule({
        "_name": "cosine", "lr": 1e-4, "max_lr": 1e-3,
        "warmup_updates": 0, "lr_period_updates": 100, "lr_shrink": 0.5,
    })
    assert float(sched(0)) == pytest.approx(1e-3, rel=1e-4)  # cycle top
    assert float(sched(100)) == pytest.approx(0.5e-3, rel=1e-4)  # restart, shrunk
    assert float(sched(200)) == pytest.approx(0.25e-3, rel=1e-4)
    # mid-cycle of the second period is above its floor
    assert float(sched(150)) > float(sched(199))
    # period defaults to max_update - warmup when lr_period_updates unset
    sched2 = build_lr_schedule({
        "_name": "cosine", "lr": 1e-4, "max_lr": 1e-3,
        "warmup_updates": 10, "max_update": 110,
    })
    assert float(sched2(10)) == pytest.approx(1e-3, rel=1e-4)
    with pytest.raises(ValueError, match="cosine"):
        build_lr_schedule({"_name": "cosine", "lr": 1e-4, "max_lr": 1e-3})


@pytest.mark.quick
def test_weight_decay_reaches_every_optimizer():
    """--weight-decay must change the update for EVERY optimizer family the
    reference regularizes, not just adam/lamb (review fix)."""
    import jax.numpy as jnp

    from chimera_st_tpu.optim.optimizers import build_optimizer

    for name in ("sgd", "nag", "adagrad", "adadelta", "adamax",
                 "adafactor", "adam", "lamb"):
        p = {"w": jnp.ones(4)}
        g = {"w": jnp.zeros(4)}  # zero grad isolates the decay term
        u_wd, _ = (lambda tx: tx.update(g, tx.init(p), p))(
            build_optimizer({"_name": name, "weight_decay": 0.01},
                            lambda s: 1e-2))
        u_no, _ = (lambda tx: tx.update(g, tx.init(p), p))(
            build_optimizer({"_name": name, "weight_decay": 0.0},
                            lambda s: 1e-2))
        assert abs(float(u_wd["w"][0]) - float(u_no["w"][0])) > 0, name


@pytest.mark.quick
def test_load_state_restores_template_placement(tmp_path):
    """load_state re-applies the template's device placement (review fix:
    host numpy leaves dropped ZeRO/TP shardings on resume)."""
    from chimera_st_tpu.checkpoint.store import load_state, save_state

    tx = optax.adam(1e-3)
    params = {"w": jnp.ones((4, 4))}
    state = TrainState(jnp.asarray(3), params, tx.init(params))
    path = str(tmp_path / "s.ckpt")
    save_state(path, state, {"k": 1})

    template = TrainState(jnp.asarray(0), {"w": jnp.zeros((4, 4))},
                          tx.init({"w": jnp.zeros((4, 4))}))
    restored, extra = load_state(path, template)
    assert extra["k"] == 1 and int(restored.step) == 3
    for tmpl_leaf, rest_leaf in zip(
        jax.tree_util.tree_leaves(template.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        assert isinstance(rest_leaf, jax.Array)
        assert rest_leaf.sharding == tmpl_leaf.sharding
