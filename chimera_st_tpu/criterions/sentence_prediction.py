"""Sentence prediction / ranking + composite criterions.

reference: fairseq/criterions/sentence_prediction.py (classification CE over
the pooled sentence representation — roberta/bart fine-tuning),
sentence_ranking.py (ranking over candidate sets = classification over
num_classes candidates), composite_loss.py (weighted sum of underlying
criterions)."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..config.registry import CRITERIONS, register_criterion


@register_criterion("sentence_prediction")
def make_sentence_prediction(cfg: Dict):
    regression = bool(cfg.get("regression_target", False))

    def criterion(model, params, batch, rngs=None, num_updates=None, train=True):
        logits = model.apply(
            params,
            batch["src_tokens"],
            batch["prev_output_tokens"],
            deterministic=not train,
            rngs=rngs,
            method=type(model).classify,
        )
        targets = batch["target_labels"]
        n = targets.shape[0]
        if regression:
            loss = jnp.sum((logits[:, 0] - targets.astype(jnp.float32)) ** 2)
            ncorrect = jnp.zeros((), jnp.float32)
        else:
            lp = jax.nn.log_softmax(logits, axis=-1)
            loss = -jnp.sum(jnp.take_along_axis(lp, targets[:, None], axis=-1))
            ncorrect = jnp.sum(
                (jnp.argmax(logits, -1) == targets).astype(jnp.float32)
            )
        sample_size = jnp.asarray(n, jnp.float32)
        return loss, sample_size, {
            "loss": loss,
            "nll_loss": loss,
            "ncorrect": ncorrect,
            "ntokens": batch.get("ntokens", sample_size),
            "nsentences": n,
            "sample_size": sample_size,
        }

    return criterion


@register_criterion("sentence_ranking")
def make_sentence_ranking(cfg: Dict):
    """Rank candidates by their 1-logit classification scores
    (reference: criterions/sentence_ranking.py — CE over per-candidate
    scores; the score head is the model's num_classes=1 classification
    head, one forward per candidate, candidate count static)."""

    def criterion(model, params, batch, rngs=None, num_updates=None, train=True):
        cands = batch["candidate_tokens"]  # [B, N, T]
        N = cands.shape[1]
        scores = []
        for n in range(N):
            toks = cands[:, n]
            logits = model.apply(
                params, toks, toks,
                deterministic=not train, rngs=rngs,
                method=type(model).classify,
            )  # [B, 1]
            scores.append(logits[:, 0])
        scores = jnp.stack(scores, axis=1)  # [B, N]
        targets = batch["target_labels"]
        lp = jax.nn.log_softmax(scores, axis=-1)
        loss = -jnp.sum(jnp.take_along_axis(lp, targets[:, None], axis=-1))
        ncorrect = jnp.sum((jnp.argmax(scores, -1) == targets).astype(jnp.float32))
        sample_size = jnp.asarray(targets.shape[0], jnp.float32)
        return loss, sample_size, {
            "loss": loss,
            "nll_loss": loss,
            "ncorrect": ncorrect,
            "ntokens": batch.get("ntokens", sample_size),
            "nsentences": targets.shape[0],
            "sample_size": sample_size,
        }

    return criterion


@register_criterion("composite_loss")
def make_composite_loss(cfg: Dict):
    """Weighted sum of sub-criterions (reference: composite_loss.py).

    cfg: {"underlying": [{"_name": ..., "weight": w, ...}, ...]}."""
    subs = []
    for sub_cfg in cfg.get("underlying", []):
        w = float(sub_cfg.get("weight", 1.0))
        merged = {**cfg, **sub_cfg}
        subs.append((w, CRITERIONS.get(sub_cfg["_name"])(merged)))
    assert subs, "composite_loss needs at least one underlying criterion"

    def criterion(model, params, batch, rngs=None, num_updates=None, train=True):
        total = 0.0
        total_ss = 0.0
        logging: Dict = {}
        for i, (w, sub) in enumerate(subs):
            loss, ss, lg = sub(model, params, batch, rngs=rngs,
                               num_updates=num_updates, train=train)
            total = total + w * loss
            total_ss = total_ss + ss
            for k, v in lg.items():
                logging[f"sub{i}_{k}"] = v
        logging["loss"] = total
        logging["sample_size"] = total_ss
        logging.setdefault("ntokens", batch.get("ntokens", total_ss))
        logging.setdefault("nsentences", next(iter(batch.values())).shape[0]
                           if batch else 1)
        return total, total_ss, logging

    return criterion
