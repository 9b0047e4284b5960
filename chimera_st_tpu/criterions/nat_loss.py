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


@register_criterion("levenshtein_loss")
def make_levenshtein_loss(cfg: dict):
    """Three-head Levenshtein NAT loss (reference:
    fairseq/models/nat/levenshtein_transformer.py forward — insertion-count
    CE + word CE at placeholder positions + keep/delete CE; batch targets are
    host-built by tasks/translation_lev.py)."""
    pad_idx = int(cfg.get("padding_idx", 1))
    unk_idx = int(cfg.get("unk_idx", 3))
    eps = float(cfg.get("label_smoothing", 0.1))

    def criterion(model, params, batch, rngs=None, num_updates=None, train=True):
        from .label_smoothed_ce import label_smoothed_nll_loss

        ins_logits, word_logits, del_logits = model.apply(
            params,
            batch["src_tokens"],
            batch["ins_input"],
            batch["masked_tgt"],
            batch["del_input"],
            deterministic=not train,
            rngs=rngs,
        )
        # insertion-count CE over valid slots (both adjacent inputs non-pad)
        slot_valid = batch["ins_input"][:, 1:] != pad_idx
        ins_lp = jax.nn.log_softmax(ins_logits, axis=-1)
        ins_nll = -jnp.take_along_axis(
            ins_lp, batch["ins_targets"][..., None], axis=-1
        )[..., 0]
        ins_loss = jnp.sum(jnp.where(slot_valid, ins_nll, 0.0))

        # word CE at placeholder positions (label-smoothed)
        masked = batch["masked_tgt"] == unk_idx
        tgt = jnp.where(masked, batch["lev_target"], pad_idx)
        word_lp = jax.nn.log_softmax(word_logits.astype(jnp.float32), axis=-1)
        word_loss, nll = label_smoothed_nll_loss(word_lp, tgt, eps, pad_idx)

        # keep/delete CE over non-pad del_input positions
        del_valid = batch["del_input"] != pad_idx
        del_lp = jax.nn.log_softmax(del_logits, axis=-1)
        del_nll = -jnp.take_along_axis(
            del_lp, batch["del_targets"][..., None], axis=-1
        )[..., 0]
        del_loss = jnp.sum(jnp.where(del_valid, del_nll, 0.0))

        loss = word_loss + ins_loss + del_loss
        sample_size = (
            jnp.sum(masked) + jnp.sum(slot_valid) + jnp.sum(del_valid)
        ).astype(jnp.float32)
        return loss, sample_size, {
            "loss": loss,
            "nll_loss": nll,
            "ins_loss": ins_loss,
            "del_loss": del_loss,
            "ntokens": batch["ntokens"],
            "nsentences": batch["lev_target"].shape[0],
            "sample_size": sample_size,
        }

    return criterion


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


@register_criterion("nacrf_loss")
def make_nacrf_loss(cfg: dict):
    """NAT-CRF objective: -CRF log-likelihood + length CE (reference:
    nat_crf_transformer.py forward — word_ins loss from DynamicCRF)."""
    length_weight = float(cfg.get("length_loss_factor", 0.1))

    def criterion(model, params, batch, rngs=None, num_updates=None, train=True):
        from ..models.nat_vanilla import NATransformer

        llh, length_logits = model.apply(
            params,
            batch["src_tokens"],
            batch["masked_target"],
            batch["target"],
            deterministic=not train,
            rngs=rngs,
            method=NATransformer.crf_loglikelihood,
        )
        crf_loss = -jnp.sum(llh)

        max_len = length_logits.shape[-1]
        tgt_len = jnp.clip(batch["target_lengths"], 0, max_len - 1)
        len_lp = jax.nn.log_softmax(length_logits, axis=-1)
        len_loss = -jnp.sum(
            jnp.take_along_axis(len_lp, tgt_len[:, None], axis=-1)
        )

        sample_size = jnp.asarray(batch["ntokens"], jnp.float32)
        loss = crf_loss + length_weight * len_loss
        return loss, sample_size, {
            "loss": loss,
            "crf_loss": crf_loss,
            "length_loss": len_loss,
            "ntokens": batch["ntokens"],
            "nsentences": batch["target"].shape[0],
            "sample_size": sample_size,
        }

    return criterion
