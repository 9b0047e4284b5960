"""Adaptive-softmax LM loss (reference: fairseq/criterions/adaptive_loss.py).

Expects a model whose decoder exposes an `adaptive_softmax` module and a
`features_only` forward (the LM/decoder path); the loss is the clustered NLL."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config.registry import register_criterion


@register_criterion("adaptive_loss")
def make_adaptive_loss(cfg: dict):
    pad_idx = int(cfg.get("padding_idx", 1))

    def criterion(model, params, batch, rngs=None, num_updates=None, train=True):
        nll_per_pos = model.apply(
            params,
            batch["net_tokens"],
            batch["target"],
            deterministic=not train,
            rngs=rngs,
            method=type(model).adaptive_nll,
        )
        keep = batch["target"] != pad_idx
        loss = jnp.sum(jnp.where(keep, nll_per_pos, 0.0))
        ntokens = batch["ntokens"]
        return loss, ntokens, {
            "loss": loss,
            "nll_loss": loss,
            "ntokens": ntokens,
            "nsentences": batch["target"].shape[0],
            "sample_size": ntokens,
        }

    return criterion
