import numpy as np

from chimera_st_tpu.criterions.masked_lm import apply_bert_masking
from chimera_st_tpu.data.dictionary import Dictionary
from chimera_st_tpu.data.noising import NoisingDataset, WordDropout, WordShuffle


def _dict():
    d = Dictionary()
    for w in ["he@@", "llo", "world", "foo", "bar"]:
        d.add_symbol(w)
    return d


def test_word_dropout_keeps_eos_and_some_words():
    d = _dict()
    rng = np.random.default_rng(0)
    toks = np.asarray([4, 5, 6, 7, 8, d.eos()], np.int32)  # he@@ llo world foo bar
    wd = WordDropout(d)
    out = wd.noising(toks, dropout_prob=0.5, rng=rng)
    assert out[-1] == d.eos()
    assert 1 <= len(out) <= len(toks)
    # subword grouping: "he@@ llo" drops atomically
    for _ in range(20):
        o = wd.noising(toks, 0.9, rng=rng)
        body = list(o[:-1])
        assert (4 in body) == (5 in body)


def test_word_dropout_blanking():
    d = _dict()
    toks = np.asarray([6, 7, 8, d.eos()], np.int32)
    out = WordDropout(d).noising(toks, 0.99, blank_idx=d.unk(),
                                 rng=np.random.default_rng(1))
    assert len(out) == len(toks)  # blanked, not removed
    assert (out[:-1] == d.unk()).sum() >= 2


def test_word_shuffle_is_permutation():
    d = _dict()
    toks = np.asarray([6, 7, 8, d.eos()], np.int32)
    out = WordShuffle(d).noising(toks, 3, rng=np.random.default_rng(2))
    assert sorted(out.tolist()) == sorted(toks.tolist())
    assert out[-1] == d.eos()


def test_noising_dataset_deterministic_per_index():
    d = _dict()
    data = [np.asarray([6, 7, 8, 4, 5, d.eos()], np.int32)] * 3
    ds = NoisingDataset(data, d, seed=7)
    a, b = ds[0], ds[0]
    np.testing.assert_array_equal(a, b)


def test_bert_masking():
    rng = np.random.default_rng(3)
    toks = np.arange(4, 104, dtype=np.int32)
    masked, target = apply_bert_masking(toks, mask_idx=103, vocab_size=104,
                                        rng=rng)
    m = target != 1
    assert 0 < m.sum() < len(toks)
    # unmasked positions unchanged and target=pad
    assert (masked[~m] == toks[~m]).all()
    # at masked positions the target is the original token
    assert (target[m] == toks[m]).all()
