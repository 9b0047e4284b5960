"""Async dispatch mode of the Trainer (r4 host-loop lever).

With async_depth > 0 the trainer buffers per-update device outputs instead
of materializing them per step (each host read blocks until the step
completes, serializing host and device — the reference trainer syncs per
update because co-located CUDA reads are ~free, fairseq/trainer.py logging
path). drain_metrics() replays the buffered outputs in order. The compute
path is IDENTICAL — only when the host looks at the results changes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class _ToyCriterion:
    """Minimal criterion: least squares on params['w'], model unused."""

    def __call__(self, model, params, batch, rngs=None, num_updates=None,
                 train=True):
        pred = batch["x"] * params["w"]
        loss = jnp.sum((pred - batch["y"]) ** 2)
        ss = jnp.asarray(batch["x"].shape[0], jnp.float32)
        return loss, ss, {"loss": loss, "sample_size": ss,
                          "ntokens": ss, "nsentences": ss}


def _make_trainer(async_depth):
    from chimera_st_tpu.optim.lr_schedulers import build_lr_schedule
    from chimera_st_tpu.optim.optimizers import build_optimizer
    from chimera_st_tpu.train.trainer import Trainer

    sched = build_lr_schedule({"_name": "fixed", "lr": 1e-2})
    tx = build_optimizer({"_name": "adam"}, sched)
    params = {"w": jnp.ones(())}
    return Trainer(None, _ToyCriterion(), tx, params, lr_schedule=sched,
                   async_depth=async_depth)


def _batches(n, poison_at=None):
    rng = np.random.default_rng(0)
    out = []
    for i in range(n):
        x = rng.normal(size=(4,)).astype(np.float32)
        y = (3.0 * x).astype(np.float32)
        if poison_at is not None and i == poison_at:
            y = np.full_like(y, np.nan)
        out.append({"x": x, "y": y})
    return out


@pytest.mark.quick
def test_async_matches_sync_exactly():
    from chimera_st_tpu.logging import metrics as metrics_mod

    results = {}
    for mode, depth in (("sync", 0), ("async", 2)):
        metrics_mod.reset()
        tr = _make_trainer(depth)
        with metrics_mod.aggregate("train_inner") as agg:
            for i, b in enumerate(_batches(7)):
                out = tr.train_step([b], seed=i)
                assert (out is None) == (depth > 0)
            last = tr.drain_metrics()
            smoothed = dict(agg.get_smoothed_values())
        if depth > 0:
            assert last is not None and "lr" in last and "gnorm" in last
        else:
            assert last is None  # nothing was deferred
        results[mode] = (float(np.asarray(tr.state.params["w"])),
                         tr.num_updates, smoothed)
    w_s, n_s, m_s = results["sync"]
    w_a, n_a, m_a = results["async"]
    assert w_s == w_a  # identical compute path, bit-identical params
    assert n_s == n_a == 7
    for k in ("loss", "gnorm", "lr", "ups", "wps"):
        assert k in m_s and k in m_a, k
        if k not in ("ups", "wps"):  # speed meters divide by wall time
            assert m_s[k] == pytest.approx(m_a[k]), k


@pytest.mark.quick
def test_async_nonfinite_skip_reconciles_counter(caplog):
    import logging as pylogging

    from chimera_st_tpu.logging import metrics as metrics_mod

    metrics_mod.reset()
    tr = _make_trainer(async_depth=8)
    with metrics_mod.aggregate("train_inner"):
        for i, b in enumerate(_batches(5, poison_at=2)):
            tr.train_step([b], seed=i)
        # optimistic mirror counts every dispatch
        assert tr.num_updates == 5
        with caplog.at_level(pylogging.WARNING,
                             logger="chimera_st_tpu.train.trainer"):
            tr.drain_metrics()
    # the poisoned update was skipped on device; drain reconciles
    assert tr.num_updates == 4
    assert any("non-finite" in r.message for r in caplog.records)


@pytest.mark.quick
def test_async_backpressure_bounds_in_flight():
    tr = _make_trainer(async_depth=2)
    for i, b in enumerate(_batches(6)):
        tr.train_step([b], seed=i)
        # in-flight window (dispatched minus known-complete) stays bounded
        assert len(tr._deferred) - tr._drained_upto <= 2 + 1
    tr.drain_metrics()
    assert tr._deferred == [] and tr.num_updates == 6
