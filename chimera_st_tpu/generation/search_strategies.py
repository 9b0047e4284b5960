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


def _bank_stripe_pick(pool_s, banks, k2):
    """Pick k2 pool indices by the reference's dynamic-beam-allocation order
    (search.py:436-505): sort candidates by (bank DESC, score DESC), stripe
    POSITIONALLY within each bank, then round-robin the stripes — best of
    each bank (highest bank first), second-best of each bank, and so on.
    Shared by the ordered and unordered constrained strategies.

    Everything is exact integer-rank arithmetic (no float composite keys —
    ULP at 1e9 is ~64, which rounded away within-stripe ordering in an
    earlier float version) and the within-bank stripe is positional, so
    score TIES cannot flood stripe 0 and evict a higher-bank candidate
    (a count-of-strictly-better stripe did exactly that: a tier of equal
    junk scores all counted as stripe 0 and the constraint-advancing
    candidate lost the only stripe that is guaranteed survival).
    Dead/duplicate candidates are forced last."""
    n_pool = pool_s.shape[1]
    dead = pool_s <= NEG_INF
    # positional rank in the (bank desc, score desc) order; score ties
    # broken by pool index (stable argsort), so ranks are unique.
    # int32 throughout (x64 is disabled under jit); max key value is
    # n_pool*(n_pool+2) — far from overflow for any real pool
    bank_i = jnp.where(dead, -1, banks.astype(jnp.int32))
    max_bank = jnp.max(bank_i, axis=1, keepdims=True)
    score_rank = jnp.argsort(jnp.argsort(-pool_s, axis=1), axis=1)
    key1 = (max_bank - bank_i) * n_pool + score_rank.astype(jnp.int32)
    rank1 = jnp.argsort(jnp.argsort(key1, axis=1), axis=1).astype(jnp.int32)
    # stripe = position within own bank = same-bank candidates ranked ahead
    same_bank = bank_i[:, :, None] == bank_i[:, None, :]
    ahead = rank1[:, None, :] < rank1[:, :, None]
    stripe = jnp.sum(same_bank & ahead, axis=2).astype(jnp.int32)
    order_key = jnp.where(
        dead, n_pool * (n_pool + 2), stripe * (n_pool + 1) + rank1
    )
    return jnp.argsort(order_key, axis=1)[:, :k2]


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

        pick = _bank_stripe_pick(pool_s, new_prog, k2)

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


class UnorderedLexicallyConstrainedSearch(SearchStrategy):
    """Unordered lexical constraints (reference:
    token_generation_constraints.py:202 UnorderedConstraintState +
    search.py:210 LexicallyConstrainedBeamSearch with --constraints
    unordered): constraint phrases may be satisfied in ANY order.

    The reference walks a trie with Python Counters per beam; here the state
    is three static int32 planes per beam — a completed-phrase bitmask, the
    index of the phrase currently being matched (-1 = at root), and the
    position within it. ``phrases`` is [B, P, L] (per-sentence phrase list,
    rows padded with ``pad``; P <= 31 for the bitmask). Transition semantics
    follow the reference's advance(): continue the current phrase if the
    token matches, else fall off to the root (losing partial progress, as
    the reference's fall-off bookkeeping does) and try to start any
    not-yet-completed phrase; the bank is the number of constraint tokens
    the hypothesis currently holds (completed phrases + current progress).
    Known delta vs the trie: phrases sharing a prefix are matched against
    the lowest-indexed open phrase rather than a shared trie path, which can
    differ when one phrase is a strict prefix of another."""

    def __init__(self, phrases: jax.Array, pad: int = 1, eos: int = 2):
        self.phrases = phrases.astype(jnp.int32)  # [B, P, L]
        B, P, L = self.phrases.shape
        assert P <= 31, f"at most 31 unordered phrases per sentence (got {P})"
        self.pad = pad
        self.eos = eos
        self.lens = jnp.sum(self.phrases != pad, axis=2).astype(jnp.int32)
        self.total_tokens = jnp.sum(self.lens, axis=1)  # [B]

    def init_state(self, batch_size: int, beam_size: int):
        z = jnp.zeros((batch_size, beam_size), jnp.int32)
        return {"mask": z, "cur": z - 1, "pos": z}

    def _completed_tokens(self, mask):
        """[..., ] bitmask -> constraint tokens inside completed phrases."""
        P = self.phrases.shape[1]
        bits = (mask[..., None] >> jnp.arange(P)) & 1  # [..., P]
        return jnp.sum(bits * self.lens[:, None, :], axis=-1)

    def _finished(self, mask):
        return self._completed_tokens(mask) >= self.total_tokens[:, None]

    def adjust(self, logprobs, state, step, alive_seq):
        # ban eos while any constraint phrase is unmet (reference:
        # search.py:310-324 "Prevent EOS for unfinished hyps")
        unfinished = ~self._finished(state["mask"])  # [B, K]
        return logprobs.at[:, :, self.eos].set(
            jnp.where(unfinished, NEG_INF, logprobs[:, :, self.eos])
        )

    def _advance(self, mask, cur, pos, tok):
        """Vectorized reference advance(): (mask, cur, pos) x token ->
        (mask', cur', pos'). All inputs [B, N]; phrase tables broadcast on
        the batch axis."""
        B, P, L = self.phrases.shape
        N = cur.shape[1]
        # token that continues the current phrase (safe-gathered)
        cur_ix = jnp.clip(cur, 0, P - 1)
        pos_ix = jnp.clip(pos, 0, L - 1)
        bcast = jnp.broadcast_to(self.phrases[:, None], (B, N, P, L))
        ph = jnp.take_along_axis(
            bcast, cur_ix[:, :, None, None], axis=2
        )[:, :, 0]  # [B, N, L]
        cont_tok = jnp.take_along_axis(ph, pos_ix[..., None], axis=-1)[..., 0]
        cur_len = jnp.take_along_axis(
            jnp.broadcast_to(self.lens[:, None], (B, N, P)),
            cur_ix[..., None], axis=-1,
        )[..., 0]
        continuing = (cur >= 0) & (tok == cont_tok)
        done_cont = continuing & (pos + 1 >= cur_len)

        # starting some open phrase: first tokens [B, P]
        first = self.phrases[:, :, 0]  # [B, P]
        open_p = (self.lens[:, None, :] > 0) & (
            ((mask[..., None] >> jnp.arange(P)) & 1) == 0
        )  # [B, N, P]
        startable = open_p & (tok[..., None] == first[:, None, :])
        any_start = jnp.any(startable, axis=-1)
        p_star = jnp.argmax(startable, axis=-1).astype(jnp.int32)  # first hit
        start_len = jnp.take_along_axis(
            jnp.broadcast_to(self.lens[:, None], cur.shape + (P,)),
            p_star[..., None], axis=-1,
        )[..., 0]
        done_start = any_start & (start_len <= 1)

        new_mask = jnp.where(
            done_cont, mask | (1 << cur_ix),
            jnp.where(done_start & ~continuing, mask | (1 << p_star), mask),
        )
        new_cur = jnp.where(
            continuing, jnp.where(done_cont, -1, cur),
            jnp.where(any_start & ~done_start, p_star, -1),
        )
        new_pos = jnp.where(
            continuing, jnp.where(done_cont, 0, pos + 1),
            jnp.where(any_start & ~done_start, 1, 0),
        )
        return new_mask, new_cur, new_pos

    def _bank(self, mask, cur, pos):
        return self._completed_tokens(mask) + pos

    def select(self, alive_scores, logprobs, state, step):
        B, K, V = logprobs.shape
        P = self.phrases.shape[1]
        k2 = 2 * K
        cand = alive_scores[:, :, None] + logprobs

        # pool part 1: flat top-2K
        top_s, top_idx = jax.lax.top_k(cand.reshape(B, K * V), k2)
        top_beam = top_idx // V
        top_tok = top_idx % V

        # pool part 2: for each beam x phrase, the token advancing toward
        # that phrase (continue it if it is the current one, else its first
        # token if still open) — the unordered analog of the ordered
        # strategy's single forced candidate
        mask, cur, pos = state["mask"], state["cur"], state["pos"]
        is_cur = cur[..., None] == jnp.arange(P)  # [B, K, P]
        pos_ix = jnp.clip(pos, 0, self.phrases.shape[2] - 1)
        cont_tok = jnp.take_along_axis(
            jnp.broadcast_to(
                self.phrases[:, None], (B, K, P, self.phrases.shape[2])
            ),
            pos_ix[:, :, None, None], axis=3,
        )[..., 0]  # [B, K, P]
        first = jnp.broadcast_to(self.phrases[:, None, :, 0], (B, K, P))
        adv_tok = jnp.where(is_cur, cont_tok, first)
        open_p = (self.lens[:, None, :] > 0) & (
            ((mask[..., None] >> jnp.arange(P)) & 1) == 0
        )
        legal = open_p | is_cur
        forced_s = jnp.where(
            legal,
            alive_scores[..., None]
            + jnp.take_along_axis(logprobs, adv_tok, axis=2),
            NEG_INF,
        ).reshape(B, K * P)
        pool_s = jnp.concatenate([top_s, forced_s], axis=1)  # [B, 2K + K*P]
        pool_beam = jnp.concatenate(
            [top_beam,
             jnp.broadcast_to(
                 jnp.arange(K, dtype=top_beam.dtype)[:, None], (B, K, P)
             ).reshape(B, K * P)],
            axis=1,
        )
        pool_tok = jnp.concatenate([top_tok, adv_tok.reshape(B, K * P)], axis=1)

        # dedupe (beam, tok) pairs, keep first occurrence
        n_pool = pool_s.shape[1]
        key = pool_beam * V + pool_tok
        dup = (key[:, :, None] == key[:, None, :]) & (
            jnp.arange(n_pool)[None, :, None] > jnp.arange(n_pool)[None, None, :]
        )
        pool_s = jnp.where(jnp.any(dup, axis=2), NEG_INF, pool_s)

        # bank after taking each candidate
        g = lambda x: jnp.take_along_axis(x, pool_beam, axis=1)  # noqa: E731
        nm, nc, np_ = self._advance(g(mask), g(cur), g(pos), pool_tok)
        banks = self._bank(nm, nc, np_)

        pick = _bank_stripe_pick(pool_s, banks, k2)
        return (
            jnp.take_along_axis(pool_s, pick, axis=1),
            jnp.take_along_axis(pool_beam, pick, axis=1),
            jnp.take_along_axis(pool_tok, pick, axis=1),
        )

    def update(self, state, topk_beam, topk_tok, alive_pick, step):
        beam = jnp.take_along_axis(topk_beam, alive_pick, axis=1)  # [B, K]
        tok = jnp.take_along_axis(topk_tok, alive_pick, axis=1)
        g = lambda x: jnp.take_along_axis(x, beam, axis=1)  # noqa: E731
        nm, nc, np_ = self._advance(
            g(state["mask"]), g(state["cur"]), g(state["pos"]), tok
        )
        return {"mask": nm, "cur": nc, "pos": np_}


def pack_constraint_phrases(batch_phrases, pad: int = 1) -> jnp.ndarray:
    """[[phrase tokens...], ...] per sentence -> [B, P, L] phrase-table
    (the unordered packer; reference pack_constraints keeps per-phrase
    structure in its count-prefixed flat rows — here the structure IS the
    array layout)."""
    import numpy as np

    P = max((len(ps) for ps in batch_phrases), default=1) or 1
    L = max(
        (len(p) for ps in batch_phrases for p in ps), default=1
    ) or 1
    out = np.full((len(batch_phrases), P, L), pad, np.int32)
    for i, ps in enumerate(batch_phrases):
        for j, p in enumerate(ps):
            out[i, j, : len(p)] = p
    return jnp.asarray(out)


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
