"""Sequence scorer: log-prob scoring of given targets
(reference: fairseq/sequence_scorer.py, the --score-reference path)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


class SequenceScorer:
    def __init__(self, model, pad: int = 1, eos: int = 2):
        self.model = model
        self.pad = pad
        self.eos = eos
        self._jit_score = jax.jit(self._score)

    def _score(self, params, encoder_out, encoder_padding_mask, target):
        from ..models.interlingua import ChimeraInterlinguaModel

        prev = jnp.concatenate(
            [jnp.full((target.shape[0], 1), self.eos, target.dtype), target[:, :-1]],
            axis=1,
        )
        prev = jnp.where(target == self.pad, self.pad, prev)
        logits = self.model.apply(
            params, prev, encoder_out, encoder_padding_mask,
            method=ChimeraInterlinguaModel.decode,
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
        from ..models.interlingua import ChimeraInterlinguaModel

        enc, enc_mask = self.model.apply(
            params, audio, padding_mask,
            method=ChimeraInterlinguaModel.encode_audio,
        )
        return self._jit_score(params, enc, enc_mask, target)
