"""CTC criterion (reference: fairseq/criterions/ctc_chi.py:18+ — CTC over
encoder outputs for ASR fine-tuning; the optional KenLM WER scoring of the
reference is replaced by greedy-decode WER counting via the native
Levenshtein extension)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config.registry import register_criterion


@register_criterion("ctc")
@register_criterion("ctc_chi")
def make_ctc_criterion(cfg: dict):
    blank_idx = int(cfg.get("blank_idx", 0))
    pad_idx = int(cfg.get("padding_idx", 1))
    eos_idx = int(cfg.get("eos_idx", 2))
    zero_infinity = bool(cfg.get("zero_infinity", True))

    def criterion(model, params, batch, rngs=None, num_updates=None, train=True):
        if hasattr(type(model), "ctc_logits"):
            # dedicated CTC head (wav2vec_ctc fine-tune model)
            logits, enc_mask = model.apply(
                params,
                batch["audio"],
                batch["audio_padding_mask"],
                mask_indices=batch.get("mask_indices"),
                num_updates=num_updates,
                deterministic=not train,
                rngs=rngs,
                method=type(model).ctc_logits,
            )
        else:
            # encoder states -> per-frame vocabulary logits via the tied
            # decoder embedding (no extra head on the ST models)
            enc, enc_mask = model.apply(
                params,
                batch["audio"],
                batch["audio_padding_mask"],
                deterministic=not train,
                rngs=rngs,
                method=type(model).encode_audio,
            )
            logits = model.apply(
                params, enc, method=lambda m, e: m.decoder.embed_tokens.attend(e)
            ).astype(jnp.float32)

        B, T, V = logits.shape
        if enc_mask is None:
            logit_paddings = jnp.zeros((B, T), jnp.float32)
        else:
            logit_paddings = enc_mask.astype(jnp.float32)
        labels = batch["target"]
        # eos terminates the seq2seq targets but is NOT a CTC label — the
        # reference masks (target != pad) & (target != eos); review fix:
        # counting eos forced the encoder to emit a frame for it and
        # spurious eos tokens surfaced in greedy-WER hypotheses
        label_paddings = (
            (labels == pad_idx) | (labels == eos_idx)
        ).astype(jnp.float32)

        per_seq = optax.ctc_loss(
            logits, logit_paddings, labels, label_paddings, blank_id=blank_idx
        )
        if zero_infinity:
            per_seq = jnp.where(jnp.isfinite(per_seq), per_seq, 0.0)
        loss = jnp.sum(per_seq)
        ntokens = batch["ntokens"]
        sample_size = labels.shape[0] if cfg.get("sentence_avg") else ntokens
        logging = {
            "loss": loss,
            "nll_loss": loss,
            "ntokens": ntokens,
            "nsentences": labels.shape[0],
            "sample_size": sample_size,
        }
        return loss, sample_size, logging

    return criterion


def ctc_greedy_decode(logits: np.ndarray, blank_idx: int = 0) -> list:
    """[T, V] -> collapsed token list (for WER reporting)."""
    ids = np.argmax(logits, axis=-1)
    out = []
    prev = None
    for t in ids:
        if t != blank_idx and t != prev:
            out.append(int(t))
        prev = t
    return out
