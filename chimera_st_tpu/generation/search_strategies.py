"""Constrained / diverse candidate-selection strategies for the jit beam loop.

TPU-native redesigns of the reference search classes
(reference: fairseq/search.py:147 PrefixConstrainedBeamSearch,
:210 LexicallyConstrainedBeamSearch + token_generation_constraints.py,
:745 DiverseSiblingsSearch). Dynamic Python state machines become static
per-beam arrays carried through the decode loop via the SearchStrategy hooks
(generation/beam_search.py): the constraint "state" is an integer progress
pointer per beam, candidate pools are fixed-size, and dynamic beam allocation
(Post & Vilar 2018 banks) becomes a static (stripe, score) sort key.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .beam_search import NEG_INF, SearchStrategy


class PrefixConstrainedSearch(SearchStrategy):
    """Masks log-probs through a user callback
    (reference: search.py:147-205 PrefixConstrainedBeamSearch).

    ``allowed_fn(alive_seq [B, K, L], step) -> [B, K, V]`` must be
    jax-traceable and return either a boolean allowed-mask or an additive
    float mask (0 allowed / -inf banned)."""

    def __init__(self, allowed_fn: Callable):
        self.allowed_fn = allowed_fn

    def adjust(self, logprobs, state, step, alive_seq):
        mask = self.allowed_fn(alive_seq, step)
        if mask.dtype == jnp.bool_:
            return jnp.where(mask, logprobs, NEG_INF)
        return logprobs + mask.astype(logprobs.dtype)


class DiverseSiblingsSearch(SearchStrategy):
    """Intra-beam sibling rank penalty (reference: search.py:745-800;
    Li & Jurafsky 2016, https://arxiv.org/abs/1611.08562):

    per beam, the rank-r candidate's score is lowered by r * diversity_rate
    (the penalty persists in the cumulative hypothesis score, as in the
    reference's in-place rewrite), then the top 2K of all K * 2K penalized
    candidates are kept."""

    def __init__(self, diversity_rate: float):
        self.rate = float(diversity_rate)

    def select(self, alive_scores, logprobs, state, step):
        B, K, V = logprobs.shape
        k = 2 * K
        cand = alive_scores[:, :, None] + logprobs  # [B, K, V]
        s, t = jax.lax.top_k(cand, k)  # per-beam candidates [B, K, 2K]
        s = s - (jnp.arange(1, k + 1, dtype=s.dtype) * self.rate)[None, None, :]
        flat_s = s.reshape(B, K * k)
        flat_t = t.reshape(B, K * k)
        top_s, idx = jax.lax.top_k(flat_s, k)
        top_beam = idx // k
        top_tok = jnp.take_along_axis(flat_t, idx, axis=1)
        return top_s, top_beam, top_tok


class LexicallyConstrainedSearch(SearchStrategy):
    """Ordered lexical constraints (reference: search.py:210-525 +
    fairseq/token_generation_constraints.py OrderedConstraintState;
    Post & Vilar 2018 dynamic beam allocation).

    ``constraints`` is [B, C] int32 — each sentence's constraint phrases
    flattened into one ordered token sequence, padded with ``pad``. Per-beam
    state is a progress pointer into that sequence. Each step the candidate
    pool is the usual flat top-2K plus one forced constraint-advance candidate
    per beam; candidates are bank-assigned by constraint progress and chosen
    by the (stripe-within-bank, score) order of the reference."""

    def __init__(self, constraints: jax.Array, pad: int = 1, eos: int = 2):
        self.constraints = constraints.astype(jnp.int32)  # [B, C]
        self.pad = pad
        self.eos = eos
        self.n_constraints = jnp.sum(self.constraints != pad, axis=1)  # [B]

    def init_state(self, batch_size: int, beam_size: int):
        return jnp.zeros((batch_size, beam_size), jnp.int32)  # progress

    def adjust(self, logprobs, state, step, alive_seq):
        # ban eos for beams that have not generated all constraints
        # (reference: search.py:310-324 "Prevent EOS for unfinished hyps")
        unfinished = state < self.n_constraints[:, None]  # [B, K]
        return logprobs.at[:, :, self.eos].set(
            jnp.where(unfinished, NEG_INF, logprobs[:, :, self.eos])
        )

    def _next_token(self, progress):
        """Next constraint token per beam ([B, K] progress -> [B, K])."""
        C = self.constraints.shape[1]
        idx = jnp.minimum(progress, C - 1)
        return jnp.take_along_axis(
            jnp.broadcast_to(self.constraints[:, None, :], progress.shape + (C,)),
            idx[..., None],
            axis=2,
        )[..., 0]

    def select(self, alive_scores, logprobs, state, step):
        B, K, V = logprobs.shape
        k2 = 2 * K
        cand = alive_scores[:, :, None] + logprobs

        # pool part 1: flat top-2K
        top_s, top_idx = jax.lax.top_k(cand.reshape(B, K * V), k2)
        top_beam = top_idx // V
        top_tok = top_idx % V

        # pool part 2: forced constraint-advance candidate per beam
        nxt = self._next_token(state)  # [B, K]
        has_next = state < self.n_constraints[:, None]
        forced_s = jnp.where(
            has_next,
            alive_scores + jnp.take_along_axis(logprobs, nxt[..., None], axis=2)[..., 0],
            NEG_INF,
        )
        pool_s = jnp.concatenate([top_s, forced_s], axis=1)  # [B, 3K]
        pool_beam = jnp.concatenate(
            [top_beam, jnp.broadcast_to(jnp.arange(K, dtype=top_beam.dtype), (B, K))],
            axis=1,
        )
        pool_tok = jnp.concatenate([top_tok, nxt], axis=1)

        # dedupe (beam, tok) pairs — the forced candidate may already be in
        # the top-2K (reference dedupes its candidate list too)
        key = pool_beam * V + pool_tok
        dup = (key[:, :, None] == key[:, None, :]) & (
            jnp.arange(3 * K)[None, :, None] > jnp.arange(3 * K)[None, None, :]
        )
        is_dup = jnp.any(dup, axis=2)
        pool_s = jnp.where(is_dup, NEG_INF, pool_s)

        # bank = constraints met after taking this candidate
        prog_of_beam = jnp.take_along_axis(state, pool_beam, axis=1)
        advances = pool_tok == self._next_token(prog_of_beam)
        new_prog = prog_of_beam + (
            advances & (prog_of_beam < self.n_constraints[:, None])
        ).astype(jnp.int32)

        # stripe: rank within its bank by score (reference: search.py:440-470)
        same_bank = new_prog[:, :, None] == new_prog[:, None, :]
        better = pool_s[:, None, :] > pool_s[:, :, None]
        stripe = jnp.sum(same_bank & better, axis=2).astype(jnp.float32)
        # order by (stripe asc, score desc). Mixing stripe*1e9 with raw f32
        # scores collapsed within-stripe ordering (ULP at 1e9 is ~64 — any
        # realistic log-prob gap rounded away; review fix). Build an exact
        # integer key instead: score RANK within the pool (int32) composed
        # with the stripe, dead/dup candidates forced last.
        n_pool = pool_s.shape[1]
        score_order = jnp.argsort(-pool_s, axis=1)
        score_rank = jnp.argsort(score_order, axis=1)  # 0 = best score
        dead = pool_s <= NEG_INF
        stripe_i = jnp.where(dead, n_pool, stripe.astype(jnp.int32))
        order_key = stripe_i * (n_pool + 1) + score_rank
        pick = jnp.argsort(order_key, axis=1)[:, :k2]

        sel_s = jnp.take_along_axis(pool_s, pick, axis=1)
        sel_beam = jnp.take_along_axis(pool_beam, pick, axis=1)
        sel_tok = jnp.take_along_axis(pool_tok, pick, axis=1)
        # stash candidate progress for update() via functional state trick:
        # recompute there (cheap) — select returns only the triple
        return sel_s, sel_beam, sel_tok

    def update(self, state, topk_beam, topk_tok, alive_pick, step):
        # recompute progress of the chosen alive candidates
        beam = jnp.take_along_axis(topk_beam, alive_pick, axis=1)  # [B, K]
        tok = jnp.take_along_axis(topk_tok, alive_pick, axis=1)
        prog = jnp.take_along_axis(state, beam, axis=1)
        advances = tok == self._next_token(prog)
        return prog + (advances & (prog < self.n_constraints[:, None])).astype(
            jnp.int32
        )


def pack_constraints(batch_phrases, pad: int = 1) -> jnp.ndarray:
    """[[phrase tokens...], ...] per sentence -> ordered flat [B, C] array
    (reference: token_generation_constraints.py pack_constraints)."""
    import numpy as np

    flat = [
        [t for phrase in phrases for t in phrase] for phrases in batch_phrases
    ]
    C = max((len(f) for f in flat), default=1) or 1
    out = np.full((len(flat), C), pad, np.int32)
    for i, f in enumerate(flat):
        out[i, : len(f)] = f
    return jnp.asarray(out)
