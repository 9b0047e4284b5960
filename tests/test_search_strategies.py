"""Constrained / diverse-sibling search strategies (VERDICT r1 item 7).

Semantics mirror the reference docstrings: search.py:147
PrefixConstrainedBeamSearch (callback-masked vocab), :210
LexicallyConstrainedBeamSearch (all constraints present, in order, before
eos), :745 DiverseSiblingsSearch (rate 0 == plain beam; rate > 0 diversifies
siblings)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_st_tpu.generation.beam_search import beam_search
from chimera_st_tpu.generation.search_strategies import (
    DiverseSiblingsSearch,
    LexicallyConstrainedSearch,
    PrefixConstrainedSearch,
    pack_constraints,
)

V = 12
B, K = 2, 4
MAX_LEN = 8
EOS, PAD = 2, 1


def make_step_fn(seed=0, peak=2.0):
    """Stationary stochastic-ish logits: depend on (last token, position)."""
    rng = np.random.default_rng(seed)
    table = jnp.asarray(rng.normal(size=(V, MAX_LEN + 1, V)) * peak, jnp.float32)

    def step_fn(tokens_t, index, caches):
        tok = tokens_t[:, 0]
        logits = table[tok, index]
        return jax.nn.log_softmax(logits, -1), caches

    return step_fn


def dummy_caches():
    return {"d": jnp.zeros((B * K, 1), jnp.float32)}


def run(strategy=None, min_len=1, step_fn=None):
    return beam_search(
        step_fn or make_step_fn(),
        dummy_caches(),
        batch_size=B,
        beam_size=K,
        max_len=MAX_LEN,
        eos=EOS,
        pad=PAD,
        min_len=min_len,
        strategy=strategy,
    )


def test_diverse_siblings_rate0_matches_plain_beam():
    t0, s0, l0 = run(strategy=None)
    t1, s1, l1 = run(strategy=DiverseSiblingsSearch(0.0))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-5)


def test_diverse_siblings_diversifies():
    step_fn = make_step_fn(seed=3, peak=0.3)  # flat-ish: plain beam collapses
    t0, _, l0 = map(np.asarray, run(step_fn=step_fn))
    t1, _, l1 = map(np.asarray, run(strategy=DiverseSiblingsSearch(5.0), step_fn=step_fn))

    def n_unique_first_tokens(t):
        return len(set(int(x) for x in t[0, :, 0]))

    assert n_unique_first_tokens(t1) >= n_unique_first_tokens(t0)
    assert np.isfinite(np.asarray(l1)).all()


def test_prefix_constrained_masks_vocab():
    allowed = jnp.zeros((V,), bool).at[jnp.asarray([2, 5, 6])].set(True)

    def allowed_fn(alive_seq, step):
        return jnp.broadcast_to(allowed[None, None, :], (B, K, V))

    tokens, scores, lens = map(
        np.asarray, run(strategy=PrefixConstrainedSearch(allowed_fn))
    )
    for b in range(B):
        for k in range(K):
            L = int(lens[b, k])
            assert set(tokens[b, k, :L].tolist()) <= {2, 5, 6}


def test_prefix_constrained_position_dependent():
    # force token 7 at step 0 only; afterwards anything
    def allowed_fn(alive_seq, step):
        only7 = jnp.zeros((V,), bool).at[7].set(True)
        anything = jnp.ones((V,), bool)
        row = jnp.where(step == 0, only7, anything)
        return jnp.broadcast_to(row[None, None, :], (B, K, V))

    tokens, _, lens = map(np.asarray, run(strategy=PrefixConstrainedSearch(allowed_fn)))
    assert (tokens[:, :, 0] == 7).all()


def test_lexically_constrained_all_constraints_present_in_order():
    cons = pack_constraints([[[5, 9]], [[4], [8]]], pad=PAD)  # sent0: "5 9"; sent1: "4","8"
    tokens, scores, lens = map(
        np.asarray,
        run(strategy=LexicallyConstrainedSearch(cons, pad=PAD, eos=EOS)),
    )
    for b, required in enumerate([[5, 9], [4, 8]]):
        real = 0
        for k in range(K):
            if scores[b, k] < -1e5:  # unused hypothesis slot (static K)
                continue
            real += 1
            L = int(lens[b, k])
            hyp = tokens[b, k, :L].tolist()
            assert hyp[-1] == EOS
            # ordered subsequence check
            it = iter(hyp)
            assert all(tok in it for tok in required), (b, k, hyp, required)
        assert real >= 1, f"sentence {b}: no constraint-satisfying hypothesis"


def test_lexically_constrained_no_constraints_matches_plain():
    cons = pack_constraints([[], []], pad=PAD)
    t0, s0, _ = run()
    t1, s1, _ = run(strategy=LexicallyConstrainedSearch(cons, pad=PAD, eos=EOS))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))


# ------------------------------------------------- unordered lexical search


def _unordered(phrases):
    from chimera_st_tpu.generation.search_strategies import (
        UnorderedLexicallyConstrainedSearch,
        pack_constraint_phrases,
    )

    return UnorderedLexicallyConstrainedSearch(
        pack_constraint_phrases(phrases, pad=PAD), pad=PAD, eos=EOS
    )


def test_unordered_constraints_all_present_any_order():
    tokens, scores, lens = map(
        np.asarray, run(strategy=_unordered([[[5, 9]], [[4], [8]]]))
    )
    for b, phrases in enumerate([[[5, 9]], [[4], [8]]]):
        real = 0
        for k in range(K):
            if scores[b, k] < -1e5:
                continue
            real += 1
            L = int(lens[b, k])
            hyp = tokens[b, k, :L].tolist()
            assert hyp[-1] == EOS
            for p in phrases:  # each phrase contiguous, any phrase order
                assert any(
                    hyp[i:i + len(p)] == p for i in range(len(hyp))
                ), (b, k, hyp, p)
        assert real >= 1, f"sentence {b}: no constraint-satisfying hypothesis"


def test_unordered_satisfies_in_model_preferred_order():
    """A model that strongly wants '8 4' with constraints given as ['4','8']:
    unordered lets the hypothesis emit 8 first; ordered forces 4 first."""
    from chimera_st_tpu.generation.search_strategies import (
        LexicallyConstrainedSearch,
    )

    bias = np.full((MAX_LEN + 1, V), -8.0, np.float32)
    bias[0, 8] = 8.0   # step 0: token 8
    bias[1, 4] = 8.0   # step 1: token 4
    bias[2:, EOS] = 8.0
    table = jnp.asarray(bias)

    def step_fn(tokens_t, index, caches):
        logits = jnp.broadcast_to(table[index][None, :], (B * K, V))
        return jax.nn.log_softmax(logits, -1), caches

    phrases = [[[4], [8]], [[4], [8]]]
    tu, su, lu = map(np.asarray, run(strategy=_unordered(phrases), step_fn=step_fn))
    best = tu[0, 0, : int(lu[0, 0])].tolist()
    assert best[:2] == [8, 4], best  # model order, constraints still met

    cons = pack_constraints(phrases, pad=PAD)
    to, so, lo = map(
        np.asarray,
        run(strategy=LexicallyConstrainedSearch(cons, pad=PAD, eos=EOS),
            step_fn=step_fn),
    )
    # ordered must realize 4 BEFORE 8 (subsequence), which costs it the
    # model's preferred 2-step path — the best SATISFYING ordered hypothesis
    # scores strictly below the unordered top ([8, 4, eos])
    def satisfies(hyp):
        it = iter(hyp)
        return all(t in it for t in [4, 8])

    sat_scores = [
        float(so[0, k]) for k in range(K)
        if satisfies(to[0, k, : int(lo[0, k])].tolist())
    ]
    assert sat_scores, "ordered produced no constraint-satisfying hypothesis"
    assert float(su[0, 0]) > max(sat_scores)


def test_unordered_no_constraints_matches_plain():
    t0, s0, _ = run()
    t1, s1, _ = run(strategy=_unordered([[], []]))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))


def test_unordered_advance_transitions():
    """State machine unit: continue/complete/fall-off/start (reference
    UnorderedConstraintState.advance semantics)."""
    s = _unordered([[[5, 9], [7]]])  # one sentence: phrases "5 9" and "7"
    mask = jnp.zeros((1, 4), jnp.int32)
    cur = jnp.asarray([[-1, 0, 0, -1]], jnp.int32)   # root, mid-0@?, mid-0, root
    pos = jnp.asarray([[0, 1, 1, 0]], jnp.int32)
    tok = jnp.asarray([[5, 9, 3, 7]], jnp.int32)
    nm, nc, np_ = s._advance(mask, cur, pos, tok)
    nm, nc, np_ = map(np.asarray, (nm, nc, np_))
    # beam0: starts phrase 0 ("5 9") -> mid-phrase pos 1
    assert (nm[0, 0], nc[0, 0], np_[0, 0]) == (0, 0, 1)
    # beam1: completes phrase 0 -> mask bit 0 set, back to root
    assert (nm[0, 1], nc[0, 1], np_[0, 1]) == (1, -1, 0)
    # beam2: mismatch mid-phrase -> falls off, progress lost
    assert (nm[0, 2], nc[0, 2], np_[0, 2]) == (0, -1, 0)
    # beam3: single-token phrase 1 completes instantly
    assert (nm[0, 3], nc[0, 3], np_[0, 3]) == (2, -1, 0)
    # bank accounting: completed tokens + current progress
    bank = np.asarray(s._bank(jnp.asarray(nm), jnp.asarray(nc), jnp.asarray(np_)))
    assert bank[0].tolist() == [1, 2, 0, 1]
