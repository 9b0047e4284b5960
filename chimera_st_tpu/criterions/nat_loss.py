"""Non-autoregressive (CMLM) training loss
(reference: fairseq/criterions/nat_loss.py — token CE at masked positions +
length-prediction loss). Host-side uniform masking of the target follows
mask-predict training: per sample, a uniform number of positions is replaced
by the mask token."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.registry import register_criterion


def cmlm_mask_target(
    target: np.ndarray,  # [T] token ids (with eos)
    mask_idx: int,
    pad_idx: int = 1,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Replace a uniform-random fraction of non-pad positions with mask_idx
    (mask-predict training: n_mask ~ U(1, len))."""
    rng = rng or np.random.default_rng()
    out = target.copy()
    valid = np.nonzero(target != pad_idx)[0]
    if len(valid) == 0:
        return out
    n = rng.integers(1, len(valid) + 1)
    picks = rng.choice(valid, size=n, replace=False)
    out[picks] = mask_idx
    return out


@register_criterion("nat_loss")
def make_nat_loss(cfg: dict):
    pad_idx = int(cfg.get("padding_idx", 1))
    mask_idx = int(cfg.get("mask_idx", 3))
    eps = float(cfg.get("label_smoothing", 0.1))
    length_weight = float(cfg.get("length_loss_factor", 0.1))

    def criterion(model, params, batch, rngs=None, num_updates=None, train=True):
        from .label_smoothed_ce import label_smoothed_nll_loss

        logits, length_logits = model.apply(
            params,
            batch["src_tokens"],
            batch["masked_target"],
            deterministic=not train,
            rngs=rngs,
        )
        lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        # loss only at masked positions
        masked = batch["masked_target"] == mask_idx
        tgt = jnp.where(masked, batch["target"], pad_idx)
        loss_tok, nll = label_smoothed_nll_loss(lprobs, tgt, eps, pad_idx)

        # length prediction CE
        max_len = length_logits.shape[-1]
        tgt_len = jnp.clip(batch["target_lengths"], 0, max_len - 1)
        len_lp = jax.nn.log_softmax(length_logits, axis=-1)
        len_loss = -jnp.sum(
            jnp.take_along_axis(len_lp, tgt_len[:, None], axis=-1)
        )

        sample_size = jnp.sum(masked).astype(jnp.float32)
        loss = loss_tok + length_weight * len_loss
        return loss, sample_size, {
            "loss": loss,
            "nll_loss": nll,
            "length_loss": len_loss,
            "ntokens": batch["ntokens"],
            "nsentences": batch["target"].shape[0],
            "sample_size": sample_size,
        }

    return criterion
