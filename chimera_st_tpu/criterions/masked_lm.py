"""Masked LM criterion (reference: fairseq/criterions/masked_lm.py) with
host-side BERT-style masking (reference: fairseq/data/mask_tokens_dataset.py:
80/10/10 mask/random/keep split)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.registry import register_criterion


def apply_bert_masking(
    tokens: np.ndarray,  # [T] token ids
    mask_idx: int,
    vocab_size: int,
    mask_prob: float = 0.15,
    leave_unmasked_prob: float = 0.1,
    random_token_prob: float = 0.1,
    rng: Optional[np.random.Generator] = None,
    nspecial: int = 4,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (masked_tokens, target) where target is pad(=1) at unmasked
    positions (so the loss only counts masked positions)."""
    rng = rng or np.random.default_rng()
    T = len(tokens)
    mask = rng.random(T) < mask_prob
    if not mask.any():
        mask[rng.integers(T)] = True
    target = np.where(mask, tokens, 1).astype(np.int32)
    out = tokens.copy()
    u = rng.random(T)
    use_mask = mask & (u < 1.0 - leave_unmasked_prob - random_token_prob)
    use_rand = mask & (u >= 1.0 - random_token_prob)
    out[use_mask] = mask_idx
    out[use_rand] = rng.integers(nspecial, vocab_size, size=int(use_rand.sum()))
    return out.astype(np.int32), target


@register_criterion("masked_lm")
def make_masked_lm(cfg: dict):
    pad_idx = int(cfg.get("padding_idx", 1))

    def criterion(model, params, batch, rngs=None, num_updates=None, train=True):
        # model: bidirectional encoder producing [B, T, V] logits over
        # batch["net_tokens"]; batch["target"] is pad everywhere except
        # masked positions
        logits = model.apply(
            params, batch["net_tokens"], deterministic=not train, rngs=rngs
        )
        lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        target = batch["target"]
        keep = target != pad_idx
        nll = -jnp.take_along_axis(lprobs, target[..., None], axis=-1)[..., 0]
        loss = jnp.sum(jnp.where(keep, nll, 0.0))
        sample_size = jnp.sum(keep).astype(jnp.float32)
        return loss, sample_size, {
            "loss": loss,
            "nll_loss": loss,
            "ntokens": sample_size,
            "nsentences": target.shape[0],
            "sample_size": sample_size,
        }

    return criterion
