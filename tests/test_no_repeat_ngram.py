import jax.numpy as jnp
import numpy as np

from chimera_st_tpu.generation.beam_search import beam_search

PAD, EOS = 1, 2


def _logp(probs):
    p = np.asarray(probs, np.float64)
    return np.log(p / p.sum() + 1e-12)


def test_no_repeat_ngram_blocks_loop():
    """A step function that always prefers the cycle 4 -> 5 -> 4 -> 5...
    With no_repeat_ngram_size=2, once '4 5' occurred, the next '4' cannot be
    followed by '5' again, forcing a different continuation."""
    V = 7

    def step_fn(tokens_t, index, caches):
        t = tokens_t[:, 0]
        row_after_4 = jnp.asarray(_logp([0.01, 0.0, 0.05, 0.01, 0.01, 0.9, 0.02]), jnp.float32)
        row_after_5 = jnp.asarray(_logp([0.01, 0.0, 0.05, 0.01, 0.9, 0.01, 0.02]), jnp.float32)
        row_other = jnp.asarray(_logp([0.01, 0.0, 0.05, 0.01, 0.9, 0.01, 0.02]), jnp.float32)
        lp = jnp.where(
            (t == 4)[:, None], row_after_4[None, :],
            jnp.where((t == 5)[:, None], row_after_5[None, :], row_other[None, :]),
        )
        return lp, caches

    # without the constraint: 4 5 4 5 4 5 ...
    toks_free, _, lens_free = beam_search(
        step_fn, {}, batch_size=1, beam_size=2, max_len=10,
        eos=EOS, pad=PAD, max_lens=jnp.asarray([8]),
    )
    t_free = np.asarray(toks_free)[0, 0]
    assert list(t_free[:4]) == [4, 5, 4, 5]

    # with bigram blocking: the bigrams (4,5) and (5,4) can appear only once
    toks, _, lens = beam_search(
        step_fn, {}, batch_size=1, beam_size=2, max_len=10,
        eos=EOS, pad=PAD, max_lens=jnp.asarray([8]), no_repeat_ngram_size=2,
    )
    t = np.asarray(toks)[0, 0]
    L = int(np.asarray(lens)[0, 0])
    bigrams = [tuple(t[i : i + 2]) for i in range(L - 2)]
    assert len(bigrams) == len(set(bigrams)), (t, bigrams)
