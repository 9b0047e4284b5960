"""Low-rank beam-approximated CRF (DynamicCRF).

Reference: fairseq/modules/dynamic_crf_layer.py (Sun et al., "Fast
Structured Decoding for Sequence Models", 2019) — a CRF output layer whose
|V|x|V| transition matrix is low-rank factored M = E1 @ E2^T and whose
partition function / Viterbi pass run over only the top-``beam`` emission
candidates per position.

TPU-native design: the forward (logsumexp) and Viterbi recursions are
``lax.scan`` over time with static [B, K, K] transition blocks per step —
beam top-k, the einsum-built transitions, and the backtrace all stay on
device; no dynamic shapes anywhere.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

NEG_INF = -1e9


class DynamicCRF(nn.Module):
    vocab_size: int
    low_rank: int = 32
    beam: int = 64
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        init = nn.initializers.normal(stddev=0.02)
        self.E1 = self.param(
            "E1", init, (self.vocab_size, self.low_rank), self.param_dtype
        )
        self.E2 = self.param(
            "E2", init, (self.vocab_size, self.low_rank), self.param_dtype
        )

    def _beam_view(
        self,
        emissions: jax.Array,  # [B, T, V] fp32
        targets: Optional[jax.Array],  # [B, T] — forced into the beam
    ) -> Tuple[jax.Array, jax.Array]:
        """Top-``beam`` emission scores/tokens per position ([B, T, K] x2)."""
        k = min(self.beam, emissions.shape[-1])
        if targets is not None:
            # boost the gold token so it is always inside the beam
            # (reference: dynamic_crf_layer.py _compute_normalizer HACK)
            b_idx = jnp.arange(emissions.shape[0])[:, None]
            t_idx = jnp.arange(emissions.shape[1])[None, :]
            boosted = emissions.at[b_idx, t_idx, targets].add(-NEG_INF)
            _, beam_targets = jax.lax.top_k(boosted, k)
            beam_scores = jnp.take_along_axis(emissions, beam_targets, axis=2)
        else:
            beam_scores, beam_targets = jax.lax.top_k(emissions, k)
        return beam_scores, beam_targets

    def _transitions(self, beam_targets: jax.Array) -> jax.Array:
        """[B, T-1, K, K] transition blocks t(prev_k -> next_l)."""
        e1 = jnp.take(self.E1.astype(jnp.float32), beam_targets[:, :-1], axis=0)
        e2 = jnp.take(self.E2.astype(jnp.float32), beam_targets[:, 1:], axis=0)
        return jnp.einsum("btkd,btld->btkl", e1, e2)

    def loglikelihood(
        self,
        emissions: jax.Array,  # [B, T, V]
        targets: jax.Array,  # [B, T]
        mask: jax.Array,  # [B, T] True = valid
    ) -> jax.Array:
        """Per-sentence approximate log-likelihood [B]
        (reference: DynamicCRF.forward = numerator - denominator)."""
        emissions = emissions.astype(jnp.float32)
        fmask = mask.astype(jnp.float32)

        # numerator: gold path score
        emit = jnp.take_along_axis(
            emissions, targets[..., None], axis=2
        )[..., 0]
        e1 = jnp.take(self.E1.astype(jnp.float32), targets[:, :-1], axis=0)
        e2 = jnp.take(self.E2.astype(jnp.float32), targets[:, 1:], axis=0)
        trans = jnp.sum(e1 * e2, axis=-1)  # [B, T-1]
        pair_mask = fmask[:, :-1] * fmask[:, 1:]
        numerator = jnp.sum(emit * fmask, axis=1) + jnp.sum(
            trans * pair_mask, axis=1
        )

        # denominator: beam forward algorithm
        beam_scores, beam_targets = self._beam_view(emissions, targets)
        trans_blocks = self._transitions(beam_targets)  # [B, T-1, K, K]

        def step(alpha, inp):
            emit_t, trans_t, m_t = inp  # [B,K], [B,K,K], [B]
            nxt = jax.nn.logsumexp(
                alpha[:, :, None] + trans_t + emit_t[:, None, :], axis=1
            )
            alpha = jnp.where(m_t[:, None], nxt, alpha)
            return alpha, None

        alpha0 = beam_scores[:, 0]
        alpha, _ = jax.lax.scan(
            step,
            alpha0,
            (
                jnp.moveaxis(beam_scores[:, 1:], 1, 0),
                jnp.moveaxis(trans_blocks, 1, 0),
                jnp.moveaxis(mask[:, 1:], 1, 0),
            ),
        )
        denominator = jax.nn.logsumexp(alpha, axis=1)
        return numerator - denominator

    def decode(
        self,
        emissions: jax.Array,  # [B, T, V]
        mask: jax.Array,  # [B, T]
    ) -> jax.Array:
        """Viterbi over the emission beam -> tokens [B, T]
        (reference: DynamicCRF.forward_decoder)."""
        emissions = emissions.astype(jnp.float32)
        beam_scores, beam_targets = self._beam_view(emissions, None)
        trans_blocks = self._transitions(beam_targets)

        def fwd(alpha, inp):
            emit_t, trans_t, m_t = inp
            scores = alpha[:, :, None] + trans_t + emit_t[:, None, :]
            best = jnp.max(scores, axis=1)
            back = jnp.argmax(scores, axis=1).astype(jnp.int32)  # [B, K]
            # masked positions: carry alpha, point back to the same slot
            alpha = jnp.where(m_t[:, None], best, alpha)
            back = jnp.where(
                m_t[:, None], back,
                jnp.broadcast_to(
                    jnp.arange(back.shape[-1], dtype=jnp.int32)[None, :],
                    back.shape,
                ),
            )
            return alpha, back

        alpha0 = beam_scores[:, 0]
        alpha, backs = jax.lax.scan(
            fwd,
            alpha0,
            (
                jnp.moveaxis(beam_scores[:, 1:], 1, 0),
                jnp.moveaxis(trans_blocks, 1, 0),
                jnp.moveaxis(mask[:, 1:], 1, 0),
            ),
        )  # backs: [T-1, B, K]

        last = jnp.argmax(alpha, axis=1).astype(jnp.int32)  # [B]

        def back_step(k, back_t):
            k = jnp.take_along_axis(back_t, k[:, None], axis=1)[:, 0]
            return k, k

        _, ks = jax.lax.scan(back_step, last, backs, reverse=True)
        beam_idx = jnp.concatenate([ks, last[:, None].T], axis=0)  # [T, B]
        beam_idx = jnp.moveaxis(beam_idx, 0, 1)  # [B, T]
        return jnp.take_along_axis(beam_targets, beam_idx[..., None], axis=2)[
            ..., 0
        ]
