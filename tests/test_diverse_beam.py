import jax.numpy as jnp
import numpy as np

from chimera_st_tpu.generation.beam_search import beam_search

PAD, EOS = 1, 2


def _logp(probs):
    p = np.asarray(probs, np.float64)
    return np.log(p / p.sum() + 1e-12)


def test_diverse_groups_produce_different_first_tokens():
    """Near-tied tokens 4/5/6: plain beam keeps exploring the same prefix in
    all beams; diverse groups must diverge on the first token."""
    V = 8
    probs = [0.001, 0.0, 0.02, 0.001, 0.34, 0.33, 0.30, 0.008]
    rows = np.tile(_logp(probs), (8, 1))

    def step_fn(tokens_t, index, caches):
        return jnp.tile(jnp.asarray(rows[0], jnp.float32)[None, :], (tokens_t.shape[0], 1)), caches

    # pin every hypothesis to the same length (min_len == max_lens) so the
    # final K is exactly one full-length hypothesis per group — without the
    # pin, early-eos hypos from one group can outrank other groups in the
    # final sort and the first-token set becomes ranking-noise-dependent
    tokens_d, scores_d, lens_d = beam_search(
        step_fn, {}, batch_size=1, beam_size=4, max_len=8, eos=EOS, pad=PAD,
        min_len=3, max_lens=jnp.asarray([3]),
        diverse_beam_groups=4, diverse_beam_strength=10.0,
    )
    first_d = set(np.asarray(tokens_d)[0, :, 0].tolist())
    # reference semantics penalize ALL 2k' candidates of each group
    # (search.py:611 scatter_adds indices_buf), so later groups dodge even
    # runner-up tokens — the guarantee is diversity vs plain beam (which
    # clusters on the near-tied {4,5,6}), not a full permutation
    assert len(first_d) >= 3, first_d

    tokens_p, _, _ = beam_search(
        step_fn, {}, batch_size=1, beam_size=4, max_len=6, eos=EOS, pad=PAD,
        max_lens=jnp.asarray([3]),
    )
    first_p = set(np.asarray(tokens_p)[0, :, 0].tolist())
    assert len(first_d) > len(first_p) or len(first_p) == 4


def test_diverse_equals_plain_with_one_group():
    rows = np.tile(_logp([0.01, 0.0, 0.1, 0.01, 0.5, 0.3, 0.05, 0.03]), (8, 1))

    def step_fn(tokens_t, index, caches):
        return jnp.tile(jnp.asarray(rows[0], jnp.float32)[None, :], (tokens_t.shape[0], 1)), caches

    a = beam_search(step_fn, {}, batch_size=2, beam_size=4, max_len=6,
                    eos=EOS, pad=PAD, max_lens=jnp.asarray([3, 3]))
    b = beam_search(step_fn, {}, batch_size=2, beam_size=4, max_len=6,
                    eos=EOS, pad=PAD, max_lens=jnp.asarray([3, 3]),
                    diverse_beam_groups=1)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
