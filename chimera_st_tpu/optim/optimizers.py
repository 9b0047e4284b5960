"""Optimizers (reference: fairseq/optim/*), built on optax.

The reference's FP16Optimizer + DynamicLossScaler machinery
(reference: fairseq/optim/fp16_optimizer.py:16-303) is intentionally absent:
on TPU we train with bf16 compute and fp32 params/optimizer state, which
needs no loss scaling (documented behavioral delta). Gradient clipping is
composed into the chain; per-update LR comes from a schedule fn.
"""

from __future__ import annotations

import ast
from typing import Callable, Dict, Tuple

import optax

from ..config.registry import OPTIMIZERS, register_optimizer


def _parse_betas(v, default=(0.9, 0.999)) -> Tuple[float, float]:
    if v is None:
        return default
    if isinstance(v, str):
        return tuple(ast.literal_eval(v))
    return tuple(v)


def _with_l2(cfg: Dict, tx: optax.GradientTransformation):
    """torch-style L2 weight decay: add wd*param to the GRADIENT before the
    optimizer update (what torch.optim SGD/NAG/Adagrad/Adamax/Adadelta do
    with weight_decay — review fix: --weight-decay was silently ignored for
    every optimizer except adam/lamb)."""
    wd = float(cfg.get("weight_decay", 0.0))
    if wd > 0:
        return optax.chain(optax.add_decayed_weights(wd), tx)
    return tx


@register_optimizer("adam")
def adam(cfg: Dict, lr_schedule: Callable) -> optax.GradientTransformation:
    b1, b2 = _parse_betas(cfg.get("adam_betas"), (0.9, 0.999))
    eps = float(cfg.get("adam_eps", 1e-8))
    wd = float(cfg.get("weight_decay", 0.0))
    if wd > 0:
        return optax.adamw(lr_schedule, b1=b1, b2=b2, eps=eps, weight_decay=wd)
    return optax.adam(lr_schedule, b1=b1, b2=b2, eps=eps)


@register_optimizer("adafactor")
def adafactor(cfg: Dict, lr_schedule: Callable) -> optax.GradientTransformation:
    # fairseq adafactor applies DECOUPLED decay scaled by the adaptive step
    # (adafactor.py p.add_(-wd * lr_t, p)) == optax weight_decay_rate
    return optax.adafactor(
        learning_rate=lr_schedule,
        weight_decay_rate=float(cfg.get("weight_decay", 0.0)) or None,
    )


@register_optimizer("adagrad")
def adagrad(cfg: Dict, lr_schedule: Callable) -> optax.GradientTransformation:
    return _with_l2(
        cfg, optax.adagrad(lr_schedule, eps=float(cfg.get("adagrad_eps", 1e-10)))
    )


@register_optimizer("adadelta")
def adadelta(cfg: Dict, lr_schedule: Callable) -> optax.GradientTransformation:
    return _with_l2(cfg, optax.adadelta(
        lr_schedule,
        rho=float(cfg.get("adadelta_rho", 0.9)),
        eps=float(cfg.get("adadelta_eps", 1e-6)),
    ))


@register_optimizer("sgd")
def sgd(cfg: Dict, lr_schedule: Callable) -> optax.GradientTransformation:
    momentum = float(cfg.get("momentum", 0.0))
    return _with_l2(
        cfg, optax.sgd(lr_schedule, momentum=momentum if momentum > 0 else None)
    )


@register_optimizer("nag")
def nag(cfg: Dict, lr_schedule: Callable) -> optax.GradientTransformation:
    return _with_l2(cfg, optax.sgd(
        lr_schedule, momentum=float(cfg.get("momentum", 0.99)), nesterov=True
    ))


@register_optimizer("adamax")
def adamax(cfg: Dict, lr_schedule: Callable) -> optax.GradientTransformation:
    b1, b2 = _parse_betas(cfg.get("adamax_betas"), (0.9, 0.999))
    return _with_l2(cfg, optax.adamax(
        lr_schedule, b1=b1, b2=b2, eps=float(cfg.get("adamax_eps", 1e-8))
    ))


def build_optimizer(
    cfg: Dict, lr_schedule: Callable, clip_norm: float = 0.0
) -> optax.GradientTransformation:
    name = cfg.get("_name", "adam")
    tx = OPTIMIZERS.get(name)(cfg, lr_schedule)
    if clip_norm and clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx


@register_optimizer("lamb")
def lamb(cfg: Dict, lr_schedule: Callable) -> optax.GradientTransformation:
    """LAMB (reference: optim/fused_lamb.py wrapping apex FusedLAMB; here
    optax.lamb — same update rule, no fused-kernel dependency)."""
    b1, b2 = _parse_betas(cfg.get("lamb_betas"), (0.9, 0.999))
    return optax.lamb(
        lr_schedule, b1=b1, b2=b2,
        eps=float(cfg.get("lamb_eps", 1e-8)),
        weight_decay=float(cfg.get("weight_decay", 0.0)),
    )
