"""Learning-rate schedules (reference: fairseq/optim/lr_scheduler/*).

Pure functions step -> lr, registered by name. `inverse_sqrt` is the one all
Chimera recipes use (reference:
fairseq/optim/lr_scheduler/inverse_square_root_schedule.py:87-94: linear
warmup from warmup_init_lr, then decay_factor * step^-0.5 with
decay_factor = lr * sqrt(warmup_updates)).
"""

from __future__ import annotations

import math
from typing import Callable, Dict

import jax.numpy as jnp

from ..config.registry import LR_SCHEDULERS, register_lr_scheduler


@register_lr_scheduler("fixed")
def fixed(cfg: Dict) -> Callable:
    lr = float(cfg.get("lr", 0.25))
    warmup = int(cfg.get("warmup_updates", 0))
    # the CLI always passes the fairseq -1 sentinel (review fix: taken
    # literally it made warmup START at lr=-1, i.e. gradient ascent); the
    # reference fixed schedule ramps (n+1)/N * lr, i.e. effectively from 0
    warmup_init = float(cfg.get("warmup_init_lr", -1))
    if warmup_init < 0:
        warmup_init = 0.0 if warmup > 0 else lr

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup > 0:
            warm = warmup_init + (lr - warmup_init) * jnp.minimum(step, warmup) / warmup
            return jnp.where(step < warmup, warm, lr)
        return jnp.full_like(step, lr)

    return sched


@register_lr_scheduler("inverse_sqrt")
def inverse_sqrt(cfg: Dict) -> Callable:
    lr = float(cfg.get("lr", 5e-4))
    warmup = int(cfg.get("warmup_updates", 4000))
    warmup_init = float(cfg.get("warmup_init_lr", -1))
    if warmup_init < 0:
        warmup_init = 0.0 if warmup > 0 else lr
    lr_step = (lr - warmup_init) / max(warmup, 1)
    decay_factor = lr * math.sqrt(max(warmup, 1))

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_init + step * lr_step
        decay = decay_factor * jnp.power(jnp.maximum(step, 1.0), -0.5)
        return jnp.where(step < warmup, warm, decay)

    return sched


@register_lr_scheduler("cosine")
def cosine(cfg: Dict) -> Callable:
    """Cyclical cosine with warm restarts (SGDR; reference:
    cosine_lr_scheduler.py:90-151): each ``lr_period_updates`` period
    restarts the cosine, shrunk by ``lr_shrink**i`` and stretched by
    ``t_mult**i``. The reference's cosine FLOOR is --lr itself (its ceiling
    is --max-lr); an explicit min_lr overrides the floor. Review fixes: the
    previous version ran a single half-cycle then stuck at the floor forever
    and took the CLI's -1 warmup_init_lr sentinel literally (negative LR
    through warmup)."""
    lr = float(cfg.get("lr", 5e-4))
    max_lr = float(cfg.get("max_lr", lr))
    min_lr = float(cfg.get("min_lr", lr))
    warmup = int(cfg.get("warmup_updates", 0))
    warmup_init = float(cfg.get("warmup_init_lr", -1))
    if warmup_init < 0:
        warmup_init = lr  # reference cosine sentinel resolves to --lr
    period = float(cfg.get("lr_period_updates") or -1)
    if period <= 0:
        max_update = float(cfg.get("max_update") or 0)
        if max_update <= 0:
            raise ValueError(
                "cosine needs --lr-period-updates or a positive --max-update "
                "(the reference derives period = max_update - warmup_updates)")
        period = max(max_update - warmup, 1.0)
    t_mult = float(cfg.get("t_mult", 1.0))
    lr_shrink = float(cfg.get("lr_shrink", 0.1))
    lr_step = (max_lr - warmup_init) / warmup if warmup > 0 else 1.0

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_init + step * lr_step
        curr = jnp.maximum(step - warmup, 0.0)
        if t_mult != 1.0:
            i = jnp.floor(
                jnp.log1p(-curr / period * (1.0 - t_mult)) / math.log(t_mult)
            )
            t_i = jnp.power(t_mult, i) * period
            t_curr = curr - (1.0 - jnp.power(t_mult, i)) / (1.0 - t_mult) * period
        else:
            i = jnp.floor(curr / period)
            t_i = period
            t_curr = curr - period * i
        shrink = jnp.power(lr_shrink, i)
        mn = min_lr * shrink
        mx = max_lr * shrink
        cos = mn + 0.5 * (mx - mn) * (1.0 + jnp.cos(math.pi * t_curr / t_i))
        return jnp.where(step < warmup, warm, cos)

    return sched


@register_lr_scheduler("polynomial_decay")
def polynomial_decay(cfg: Dict) -> Callable:
    lr = float(cfg.get("lr", 5e-4))
    warmup = int(cfg.get("warmup_updates", 0))
    total = float(cfg.get("total_num_update") or 100000)
    end_lr = float(cfg.get("end_learning_rate", 0.0))
    power = float(cfg.get("power", 1.0))

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr * jnp.minimum(step, max(warmup, 1)) / max(warmup, 1)
        frac = jnp.clip((total - step) / jnp.maximum(total - warmup, 1.0), 0.0, 1.0)
        decay = (lr - end_lr) * jnp.power(frac, power) + end_lr
        return jnp.where(step < warmup, warm, decay)

    return sched


@register_lr_scheduler("tri_stage")
def tri_stage(cfg: Dict) -> Callable:
    peak = float(cfg.get("lr", 5e-4))
    init_scale = float(cfg.get("init_lr_scale", 0.01))
    final_scale = float(cfg.get("final_lr_scale", 0.01))
    w, h, d = cfg.get("phase_ratio", None) or (0.1, 0.4, 0.5)
    total = float(cfg.get("max_update") or 0)
    if total <= 0:
        # review fix: --max-update defaults to 0, which silently collapsed
        # the whole schedule to final_lr from step 1
        raise ValueError(
            "tri_stage needs a positive --max-update (the schedule is "
            "defined as fractions of the total update budget)")
    warmup, hold = total * w, total * h
    decay = total * d
    init_lr, final_lr = peak * init_scale, peak * final_scale

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        lr_warm = init_lr + (peak - init_lr) * jnp.minimum(step / jnp.maximum(warmup, 1), 1.0)
        in_decay = jnp.clip((step - warmup - hold) / jnp.maximum(decay, 1), 0.0, 1.0)
        lr_decay = peak * jnp.exp(jnp.log(final_scale) * in_decay)
        return jnp.where(
            step < warmup, lr_warm, jnp.where(step < warmup + hold, peak, lr_decay)
        )

    return sched


@register_lr_scheduler("triangular")
def triangular(cfg: Dict) -> Callable:
    """Cyclical triangular LR (reference:
    fairseq/optim/lr_scheduler/triangular_lr_scheduler.py — oscillate between
    min and max over lr_period_updates, optionally shrinking per cycle)."""
    min_lr = float(cfg.get("lr", 1e-5))
    max_lr = float(cfg.get("max_lr", min_lr * 10))
    period = float(cfg.get("lr_period_updates", 5000))
    stepsize = max(period / 2.0, 1.0)
    lr_shrink = float(cfg.get("lr_shrink", 0.1))
    shrink_min = bool(cfg.get("shrink_min", False))

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        cycle = jnp.floor(step / (2 * stepsize))
        shrink = jnp.power(lr_shrink, cycle)
        mx = max_lr * shrink
        mn = min_lr * shrink if shrink_min else jnp.full_like(mx, min_lr)
        x = jnp.abs(step / stepsize - 2 * cycle - 1)
        return mn + (mx - mn) * jnp.maximum(0.0, 1.0 - x)

    return sched


class PlateauSchedule:
    """reduce_lr_on_plateau (reference:
    fairseq/optim/lr_scheduler/reduce_lr_on_plateau.py, backed by torch's
    ReduceLROnPlateau with factor=lr_shrink).

    Host-mutable: call ``step_val(val_metric)`` after each validation; when it
    returns True the LR scale shrank and the trainer must re-jit the apply
    step (rare — at most a handful of times per run) via
    ``Trainer.refresh_apply()``. ``__call__`` stays a pure step->lr function
    at each trace."""

    def __init__(self, cfg: Dict):
        self.lr = float(cfg.get("lr", 5e-4))
        self.shrink = float(cfg.get("lr_shrink", 0.1))
        self.threshold = float(cfg.get("lr_threshold", 1e-4))
        self.patience = int(cfg.get("lr_patience", 0))
        self.maximize = bool(cfg.get("maximize_best_checkpoint_metric", False))
        self.warmup = int(cfg.get("warmup_updates", 0))
        self.warmup_init = float(cfg.get("warmup_init_lr", -1))
        if self.warmup_init < 0:  # fairseq sentinel (reference :45-46)
            self.warmup_init = 0.0 if self.warmup > 0 else self.lr
        self.scale = 1.0
        self._best = None
        self._bad = 0

    def step_val(self, val_metric) -> bool:
        if val_metric is None:
            return False
        better = (
            self._best is None
            or (self.maximize and val_metric > self._best + self.threshold)
            or (not self.maximize and val_metric < self._best - self.threshold)
        )
        if better:
            self._best = val_metric
            self._bad = 0
            return False
        self._bad += 1
        if self._bad > self.patience:
            self.scale *= self.shrink
            self._bad = 0
            return True
        return False

    def state_dict(self):
        return {"scale": self.scale, "best": self._best, "bad": self._bad}

    def load_state_dict(self, d):
        self.scale = d.get("scale", 1.0)
        self._best = d.get("best")
        self._bad = d.get("bad", 0)

    def __call__(self, step):
        step = jnp.asarray(step, jnp.float32)
        lr = self.lr * self.scale
        if self.warmup > 0:
            warm = self.warmup_init + (lr - self.warmup_init) * jnp.minimum(
                step, self.warmup
            ) / self.warmup
            return jnp.where(step < self.warmup, warm, lr)
        return jnp.full_like(step, lr)


@register_lr_scheduler("reduce_lr_on_plateau")
def reduce_lr_on_plateau(cfg: Dict) -> Callable:
    return PlateauSchedule(cfg)


def build_lr_schedule(cfg: Dict) -> Callable:
    name = cfg.get("_name", "fixed")
    return LR_SCHEDULERS.get(name)(cfg)
