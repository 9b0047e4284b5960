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
