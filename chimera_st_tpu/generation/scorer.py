"""Sequence scorer: log-prob scoring of given targets
(reference: fairseq/sequence_scorer.py, the --score-reference path)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


class SequenceScorer:
    """Scores gold targets under a model (no search): eos-rotated teacher
    forcing, per-token log-probs, mean + total log-prob per sentence.

    Works on any model exposing the ``encode_audio``/``encode_text`` +
    ``decode(prev_tokens, encoder_out, encoder_padding_mask)`` surface the
    beam generator uses (reference: SequenceScorer.generate
    sequence_scorer.py:29-100, driven by fairseq_cli/generate.py
    --score-reference)."""

    def __init__(self, model, pad: int = 1, eos: int = 2):
        self.model = model
        self.pad = pad
        self.eos = eos
        self._jit_score = jax.jit(self._score)

    def _score(self, params, encoder_out, encoder_padding_mask, target):
        prev = jnp.concatenate(
            [jnp.full((target.shape[0], 1), self.eos, target.dtype), target[:, :-1]],
            axis=1,
        )
        prev = jnp.where(target == self.pad, self.pad, prev)
        logits = self.model.apply(
            params, prev, encoder_out, encoder_padding_mask,
            method=type(self.model).decode,
        )
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tok_lp = jnp.take_along_axis(lp, target[..., None], axis=-1)[..., 0]
        keep = target != self.pad
        tok_lp = jnp.where(keep, tok_lp, 0.0)
        total = jnp.sum(tok_lp, axis=1)
        count = jnp.sum(keep, axis=1)
        return {
            "positional_scores": tok_lp,
            "score": total / jnp.maximum(count, 1),
            "total_logprob": total,
            "length": count,
        }

    def score_audio(self, params, audio, padding_mask, target):
        enc, enc_mask = self.model.apply(
            params, audio, padding_mask, method=type(self.model).encode_audio
        )
        return self._jit_score(params, enc, enc_mask, target)

    def score_text(self, params, src_tokens, target):
        enc, enc_mask = self.model.apply(
            params, src_tokens, method=type(self.model).encode_text
        )
        return self._jit_score(params, enc, enc_mask, target)
