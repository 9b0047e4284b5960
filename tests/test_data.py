import numpy as np
import pytest

from chimera_st_tpu.data.audio import (
    get_features_or_waveform,
    parse_path_with_slice,
    read_wav,
    write_wav,
)
from chimera_st_tpu.data.batching import (
    batch_by_size,
    collate_tokens,
    pad_to_bucket,
    quantile_buckets,
)
from chimera_st_tpu.data.iterators import (
    BackgroundPrefetcher,
    CountingIterator,
    EpochBatchIterator,
    GroupedIterator,
)
from chimera_st_tpu.data.spm import SentencePieceUnigram

SPM_MODEL = (
    "/root/reference/chimera/resources/wmt14-en-de-spm/spm_unigram10000_wave_joint.model"
)


# ------------------------------------------------------------------- audio


def test_wav_roundtrip(tmp_path):
    sr = 16000
    t = np.linspace(0, 1, sr, endpoint=False)
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, wav, sr)
    out, sr2 = read_wav(p)
    assert sr2 == sr and out.shape == wav.shape
    np.testing.assert_allclose(out, wav, atol=1e-3)


def test_wav_offset_slice(tmp_path):
    wav = np.arange(1000, dtype=np.float32) / 2000.0
    p = str(tmp_path / "t.wav")
    write_wav(p, wav)
    out, _ = read_wav(p, frame_offset=100, frames=50)
    assert out.shape == (50,)
    np.testing.assert_allclose(out, wav[100:150], atol=1e-3)


def test_parse_path_with_slice():
    assert parse_path_with_slice("a.wav:100:50") == ("a.wav", 100, 50)
    assert parse_path_with_slice("a.wav") == ("a.wav", 0, -1)
    assert parse_path_with_slice("/x/y/a.wav:0:160000") == ("/x/y/a.wav", 0, 160000)


def test_get_features_or_waveform_dispatch(tmp_path):
    wav = np.arange(200, dtype=np.float32) / 400.0
    write_wav(str(tmp_path / "a.wav"), wav)
    out = get_features_or_waveform(
        "a.wav:50:100", use_audio_input=True, audio_root=str(tmp_path)
    )
    assert out.shape == (100,)
    feats = np.random.default_rng(0).normal(size=(7, 5)).astype(np.float32)
    np.save(str(tmp_path / "f.npy"), feats)
    out2 = get_features_or_waveform("f.npy", audio_root=str(tmp_path))
    np.testing.assert_allclose(out2, feats)


# --------------------------------------------------------------------- spm


def test_spm_loads_real_model():
    m = SentencePieceUnigram.load(SPM_MODEL)
    assert len(m) == 10000
    pieces = m.encode_pieces("Hello world.")
    assert pieces[0].startswith("▁")
    assert m.decode_pieces(pieces) == "Hello world."


def test_spm_viterbi_prefers_high_score_segmentation():
    # synthetic model: "ab" as one piece scores better than "a"+"b"
    pieces = [("<unk>", 0.0, 2), ("▁", -1.0, 1), ("a", -2.0, 1), ("b", -2.0, 1), ("ab", -2.5, 1)]
    m = SentencePieceUnigram(pieces, add_dummy_prefix=False)
    assert m.encode_pieces("ab") == ["ab"]


def test_spm_unknown_char_maps_to_unk():
    pieces = [("<unk>", 0.0, 2), ("▁", -1.0, 1), ("a", -2.0, 1)]
    m = SentencePieceUnigram(pieces, add_dummy_prefix=False)
    assert m.encode_pieces("aZ") == ["a", "<unk>"]


# ---------------------------------------------------------------- batching


def test_batch_by_size_token_budget():
    sizes = np.asarray([10, 10, 10, 10, 10])
    batches = batch_by_size(np.arange(5), sizes, max_tokens=25)
    # each batch: n * max_len <= 25 -> 2 sentences per batch
    assert [len(b) for b in batches] == [2, 2, 1]


def test_batch_by_size_max_sentences():
    sizes = np.ones(7, dtype=np.int64)
    batches = batch_by_size(np.arange(7), sizes, max_sentences=3)
    assert [len(b) for b in batches] == [3, 3, 1]


def test_batch_by_size_bsz_mult():
    sizes = np.ones(10, dtype=np.int64) * 5
    batches = batch_by_size(
        np.arange(10), sizes, max_tokens=35, required_batch_size_multiple=4
    )
    # 7 fit by budget, trimmed to 4
    assert len(batches[0]) == 4


def test_quantile_buckets_and_pad():
    lengths = np.asarray([10, 20, 30, 40, 100])
    edges = quantile_buckets(lengths, 3)
    assert edges[-1] == 100
    assert pad_to_bucket(5, edges) >= 5
    assert pad_to_bucket(100, edges) == 100


def test_optimal_buckets_exact_vs_bruteforce():
    """DP edges minimize total padding exactly (checked against exhaustive
    search over all edge subsets on small inputs)."""
    import itertools

    from chimera_st_tpu.data.batching import optimal_buckets

    rng = np.random.default_rng(7)
    for _ in range(6):
        ls = rng.integers(1, 40, size=12)
        uniq = np.unique(ls)
        for k in (2, 3, 4):
            if len(uniq) <= k:
                continue
            edges = optimal_buckets(ls, k)
            assert len(edges) == k and edges[-1] == uniq[-1]
            w_dp = sum(pad_to_bucket(int(x), edges) - x for x in ls)
            w_best = min(
                sum(
                    pad_to_bucket(int(x), np.asarray(sorted(c) + [uniq[-1]]))
                    - x
                    for x in ls
                )
                for c in itertools.combinations(uniq[:-1], k - 1)
            )
            assert w_dp == w_best


def test_optimal_buckets_beats_quantiles_on_lognormal():
    from chimera_st_tpu.data.batching import optimal_buckets

    rng = np.random.default_rng(1)
    ls = (np.clip(rng.lognormal(np.log(5.5), 0.55, 512), 2, 15) * 16000)
    ls = ls.astype(np.int64)

    def waste(edges):
        return sum(pad_to_bucket(int(x), edges) - x for x in ls)

    for k in (3, 5):
        assert waste(optimal_buckets(ls, k)) <= waste(quantile_buckets(ls, k))


def test_optimal_buckets_degenerate():
    from chimera_st_tpu.data.batching import optimal_buckets

    # fewer unique lengths than buckets: every unique value is an edge
    np.testing.assert_array_equal(
        optimal_buckets([5, 5, 9], 4), np.asarray([5, 9])
    )
    # single bucket: just the max
    np.testing.assert_array_equal(optimal_buckets([3, 7, 11], 1), [11])


def test_collate_tokens_fixed_target():
    seqs = [np.asarray([1, 2, 3]), np.asarray([4])]
    out = collate_tokens(seqs, 0, target_len=6)
    assert out.shape == (2, 6)
    assert out[1].tolist() == [4, 0, 0, 0, 0, 0]


# --------------------------------------------------------------- iterators


def test_counting_and_grouped():
    c = CountingIterator(range(10))
    assert next(c) == 0 and c.n == 1
    c.skip(3)
    assert next(c) == 4
    g = GroupedIterator(range(7), 3)
    chunks = list(g)
    assert [len(ch) for ch in chunks] == [3, 3, 1]


def test_background_prefetcher_order():
    pf = BackgroundPrefetcher(range(100), buffer_size=8)
    assert list(pf) == list(range(100))


def _epoch_iter(n_batches=10, **kw):
    batches = [np.asarray([i]) for i in range(n_batches)]
    return EpochBatchIterator(lambda idx: int(idx[0]), batches, seed=7, **kw)


def test_epoch_iterator_shuffle_deterministic():
    a = list(_epoch_iter().next_epoch_itr(shuffle=True))
    b = list(_epoch_iter().next_epoch_itr(shuffle=True))
    assert a == b  # same (seed, epoch) -> same order
    it = _epoch_iter()
    e1 = list(it.next_epoch_itr(shuffle=True))
    it.next_epoch()
    e2 = list(it.next_epoch_itr(shuffle=True))
    assert e1 != e2  # different epoch -> different order


def test_epoch_iterator_sharding():
    i0 = _epoch_iter(num_shards=2, shard_id=0)
    i1 = _epoch_iter(num_shards=2, shard_id=1)
    b0 = list(i0.next_epoch_itr(shuffle=False))
    b1 = list(i1.next_epoch_itr(shuffle=False))
    assert len(b0) == len(b1) == 5
    assert set(b0) | set(b1) == set(range(10))


def test_epoch_iterator_mid_epoch_resume():
    it = _epoch_iter()
    itr = it.next_epoch_itr(shuffle=True)
    consumed = [next(itr) for _ in range(4)]
    state = it.state_dict()
    assert state["iterations_in_epoch"] == 4

    it2 = _epoch_iter()
    it2.load_state_dict(state)
    rest = list(it2.next_epoch_itr(shuffle=True))
    full = list(_epoch_iter().next_epoch_itr(shuffle=True))
    assert consumed + rest == full


def test_fasta_dataset(tmp_path):
    """reference: data/fasta_dataset.py — byte-offset index over FASTA
    records, .fasta.idx.npy cache, per-character dictionary encoding."""
    import pickle

    import numpy as np

    from chimera_st_tpu.data.dictionary import Dictionary
    from chimera_st_tpu.data.fasta import EncodedFastaDataset, FastaDataset

    prefix = str(tmp_path / "prot")
    (tmp_path / "prot.fasta").write_text(
        ">seq1 first\nMKV\nLA\n>seq2\nGG\n>seq3 tail\nACDEF\n"
    )
    assert FastaDataset.exists(prefix)
    ds = FastaDataset(prefix)
    assert len(ds) == 3
    assert ds[0] == (">seq1 first", "MKVLA")   # multi-line record joined
    assert ds[1] == (">seq2", "GG")
    assert ds[2] == (">seq3 tail", "ACDEF")
    assert [ds.num_tokens(i) for i in range(3)] == [5, 2, 5]

    # picklable (threadlocal file handle dropped), like the reference
    ds2 = pickle.loads(pickle.dumps(ds))
    assert ds2[2] == (">seq3 tail", "ACDEF")

    d = Dictionary()
    for ch in "MKVLAGCDEF":
        d.add_symbol(ch)
    eds = EncodedFastaDataset(prefix, d)
    ids = eds[0]
    assert ids[-1] == d.eos()
    assert [d[int(i)] for i in ids[:-1]] == list("MKVLA")
    # index cache written and reused
    assert (tmp_path / "prot.fasta.idx.npy").exists()
    offsets, sizes = np.load(tmp_path / "prot.fasta.idx.npy")
    np.testing.assert_array_equal(sizes, [5, 2, 5])
    eds2 = EncodedFastaDataset(prefix, d)  # loads from cache
    np.testing.assert_array_equal(eds2.sizes, eds.sizes)
