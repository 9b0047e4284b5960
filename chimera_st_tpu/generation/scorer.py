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

    def __init__(self, model, pad: int = 1, eos: int = 2,
                 retain_dropout: bool = False, seed: int = 0):
        """``retain_dropout`` keeps dropout ACTIVE while scoring — the
        reference's --retain-dropout MC-sampling eval mode
        (fairseq/sequence_generator.py retain_dropout arg / options.py);
        only the scoring path supports it here (the jitted beam loop is
        deterministic by design — PARITY.md known deltas)."""
        self.model = model
        self.pad = pad
        self.eos = eos
        self.retain_dropout = retain_dropout
        self._rng = jax.random.PRNGKey(seed)
        self._jit_score = jax.jit(self._score)

    def _score(self, params, encoder_out, encoder_padding_mask, target,
               rng=None):
        prev = jnp.concatenate(
            [jnp.full((target.shape[0], 1), self.eos, target.dtype), target[:, :-1]],
            axis=1,
        )
        prev = jnp.where(target == self.pad, self.pad, prev)
        kwargs = {}
        apply_kwargs = {}
        if self.retain_dropout:
            kwargs["deterministic"] = False
            apply_kwargs["rngs"] = {"dropout": rng}
        logits = self.model.apply(
            params, prev, encoder_out, encoder_padding_mask,
            method=type(self.model).decode, **kwargs, **apply_kwargs,
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

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _encode_kwargs(self):
        """retain_dropout keeps the WHOLE model stochastic, encoder included
        (the reference flips the full module tree to train mode)."""
        if not self.retain_dropout:
            return {}
        return {"deterministic": False, "rngs": {"dropout": self._next_rng()}}

    def score_audio(self, params, audio, padding_mask, target):
        enc, enc_mask = self.model.apply(
            params, audio, padding_mask, method=type(self.model).encode_audio,
            **self._encode_kwargs(),
        )
        return self._jit_score(params, enc, enc_mask, target,
                               rng=self._next_rng())

    def score_text(self, params, src_tokens, target):
        enc, enc_mask = self.model.apply(
            params, src_tokens, method=type(self.model).encode_text,
            **self._encode_kwargs(),
        )
        return self._jit_score(params, enc, enc_mask, target,
                               rng=self._next_rng())
