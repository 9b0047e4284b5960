"""Multi-split temperature resampling (VERDICT r1 item 4).

reference semantics: speech_to_text_dataset.py:483-557 (_get_size_ratios +
from_tsv ConcatDataset/ResamplingDataset wiring), triplet_dataset.py:357-370,
resampling_dataset.py:15-120."""

from pathlib import Path

import numpy as np
import pytest

from chimera_st_tpu.data.manifests import resample_sizes
from chimera_st_tpu.data.wrappers import ConcatDataset, ResamplingDataset


class FakeDataset:
    def __init__(self, n, tag):
        self.n, self.tag = n, tag

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return (self.tag, i)

    def num_tokens(self, i):
        return 10 + i % 7

    def collater(self, samples, **kwargs):
        return {"items": samples}


def test_size_ratios_match_reference_formula():
    # reference: _get_size_ratios — size_ratio = (smoothed_prob * total) / sizes
    sizes = [1000, 100]
    alpha = 0.5
    ratios = resample_sizes(sizes, alpha)
    _sizes = np.array(sizes, np.float64)
    prob = _sizes / _sizes.sum()
    smoothed = prob**alpha
    smoothed /= smoothed.sum()
    expected = (smoothed * _sizes.sum()) / _sizes
    np.testing.assert_allclose(ratios, expected)
    # alpha<1 upsamples the small corpus, downsamples the big one
    assert ratios[1] > 1.0 > ratios[0]


def test_resampling_dataset_epoch_semantics():
    base = FakeDataset(100, "a")
    ds = ResamplingDataset(base, size_ratio=2.5, seed=3, epoch=1)
    assert len(ds) == 250
    idx_e1 = [ds[i] for i in range(len(ds))]
    ds.set_epoch(2)
    idx_e2 = [ds[i] for i in range(len(ds))]
    assert idx_e1 != idx_e2  # re-drawn per epoch
    ds.set_epoch(1)
    assert [ds[i] for i in range(len(ds))] == idx_e1  # (seed, epoch) determinism

    small = ResamplingDataset(FakeDataset(100, "b"), size_ratio=0.3, replace=False, seed=0)
    assert len(small) == 30
    picked = [small[i][1] for i in range(30)]
    assert len(set(picked)) == 30  # without replacement: unique


def test_concat_dataset_mapping():
    a, b = FakeDataset(5, "a"), FakeDataset(3, "b")
    cat = ConcatDataset([a, b], sample_ratios=[2, 1])
    assert len(cat) == 13
    assert cat[0] == ("a", 0) and cat[9] == ("a", 4)  # repeats wrap modulo len
    assert cat[10] == ("b", 0) and cat[12] == ("b", 2)
    assert cat.num_tokens(10) == b.num_tokens(0)
    assert cat.collater([cat[0]])["items"] == [("a", 0)]


def _write_split(root: Path, split: str, n: int, seed: int):
    rng = np.random.default_rng(seed)
    from chimera_st_tpu.data.audio import write_wav

    (root / "wavs").mkdir(parents=True, exist_ok=True)
    with open(root / f"{split}.tsv", "w") as f:
        f.write("id\taudio\tn_frames\tsrc_text\ttgt_text\n")
        for i in range(n):
            ns = int(rng.integers(300, 600))
            p = root / "wavs" / f"{split}_{i}.wav"
            write_wav(str(p), (rng.normal(size=ns) * 0.1).astype(np.float32))
            f.write(f"{split}_{i}\twavs/{split}_{i}.wav:0:{ns}\t{ns}\tein haus\ta house\n")


def test_multi_split_load_applies_temperature(tmp_path):
    from chimera_st_tpu.data.manifests import TripletDataConfig, make_dataset_from_tsv
    from chimera_st_tpu.data.dictionary import Dictionary

    root = tmp_path
    _write_split(root, "train_big", 40, 0)
    _write_split(root, "train_small", 10, 1)
    (root / "dict.txt").write_text("ein 1\nhaus 1\na 1\nhouse 1\n")
    (root / "config_wave.yaml").write_text(
        f"audio_root: {root}\nuse_audio_input: true\nvocab_filename: dict.txt\n"
        "src_vocab_filename: dict.txt\nsampling_alpha: 0.5\n"
    )
    cfg = TripletDataConfig(str(root / "config_wave.yaml"))
    d = Dictionary.load(str(root / "dict.txt"))

    ds = make_dataset_from_tsv(
        str(root), "train_big,train_small", cfg, d, is_train=True,
        src_dict=d, triplet=True, seed=7,
    )
    ratios = resample_sizes([40, 10], 0.5)
    exp_sizes = [int(np.ceil(40 * ratios[0])), int(np.ceil(10 * ratios[1]))]
    assert len(ds) == sum(exp_sizes)
    assert [len(sub) for sub in ds.datasets] == exp_sizes

    # items are real triplet examples from both corpora
    ex = ds[0]
    assert ex.audio.ndim == 1 and ex.target is not None
    ex2 = ds[len(ds) - 1]
    assert ex2.audio.ndim == 1

    # eval splits are concatenated WITHOUT resampling
    ds_eval = make_dataset_from_tsv(
        str(root), "train_big,train_small", cfg, d, is_train=False,
        src_dict=d, triplet=True,
    )
    assert len(ds_eval) == 50


def test_iterator_repacks_batches_per_epoch(tmp_path):
    """End-to-end through the task: per-epoch resample changes the batches."""
    from chimera_st_tpu.tasks import setup_task
    import chimera_st_tpu.models  # noqa: F401

    root = tmp_path
    _write_split(root, "train_x", 24, 0)
    _write_split(root, "train_y", 6, 1)
    (root / "dict.txt").write_text("ein 1\nhaus 1\na 1\nhouse 1\n")
    (root / "config_wave.yaml").write_text(
        f"audio_root: {root}\nuse_audio_input: true\nvocab_filename: dict.txt\n"
        "src_vocab_filename: dict.txt\nsampling_alpha: 0.25\n"
    )
    task = setup_task({"_name": "triplet", "data": str(root)})
    task.load_dataset("train_x,train_y")
    itr = task.make_batch_iterator(
        task.dataset("train_x,train_y"), max_sentences=4, num_length_buckets=2
    )
    n1 = len(itr)
    b1 = [np.sort(b) for b in itr.frozen_batches]
    itr.epoch = 2
    b2 = [np.sort(b) for b in itr.frozen_batches]
    assert n1 > 0
    assert not all(
        len(x) == len(y) and (x == y).all() for x, y in zip(b1, b2)
    ), "epoch-2 batches identical to epoch-1 despite resampling"
    # batches drain end-to-end
    count = 0
    for batch in itr.next_epoch_itr(shuffle=True):
        assert batch["audio"].ndim == 2
        count += 1
    assert count == len(itr)


def test_token_wrappers():
    from chimera_st_tpu.data.wrappers import (
        AppendTokenDataset,
        BacktranslationDataset,
        PrependTokenDataset,
        SubsampleDataset,
        TruncateDataset,
    )

    class Toks:
        def __init__(self, items):
            self.items = items

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return self.items[int(i)]

        def num_tokens(self, i):
            return len(self.items[int(i)])

        def collater(self, samples, **kw):
            return samples

    base = Toks([np.arange(4, 9, dtype=np.int32), np.arange(4, 6, dtype=np.int32)])
    ap = AppendTokenDataset(base, 2)
    np.testing.assert_array_equal(ap[0], [4, 5, 6, 7, 8, 2])
    assert ap.num_tokens(0) == 6
    pre = PrependTokenDataset(base, 0)
    np.testing.assert_array_equal(pre[1], [0, 4, 5])
    tr = TruncateDataset(base, 3)
    np.testing.assert_array_equal(tr[0], [4, 5, 6])
    assert tr.num_tokens(0) == 3
    sub = SubsampleDataset(Toks([np.arange(i + 1) for i in range(10)]), 0.5, seed=1)
    assert len(sub) == 5
    assert all(len(sub[i]) == sub.num_tokens(i) for i in range(5))

    def bt_fn(targets):
        return [t[::-1].copy() for t in targets]

    bt = BacktranslationDataset(base, bt_fn, lambda pairs, **kw: pairs)
    batch = bt.collater([bt[0], bt[1]])
    np.testing.assert_array_equal(batch[0]["source"], [8, 7, 6, 5, 4])
    np.testing.assert_array_equal(batch[0]["target"], [4, 5, 6, 7, 8])


def test_lru_cache_dataset():
    from chimera_st_tpu.data.wrappers import LRUCacheDataset

    calls = []

    class Counting:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            calls.append(int(i))
            return np.arange(int(i) + 1)

        def num_tokens(self, i):
            return int(i) + 1

        def collater(self, samples, **kw):
            return samples

    ds = LRUCacheDataset(Counting(), max_size=2)
    np.testing.assert_array_equal(ds[3], np.arange(4))
    np.testing.assert_array_equal(ds[3], np.arange(4))
    assert calls == [3]  # second access cached
    ds[4], ds[5]  # evicts 3
    ds[3]
    assert calls == [3, 4, 5, 3]


def test_multi_corpus_sampled_dataset():
    """reference: data/multi_corpus_sampled_dataset.py — every collated batch
    comes wholly from one corpus; indices wrap modulo corpus length;
    num_tokens budgets for the largest corpus item."""
    from chimera_st_tpu.data.wrappers import MultiCorpusSampledDataset

    a, b = FakeDataset(4, "a"), FakeDataset(6, "b")
    ds = MultiCorpusSampledDataset({"a": a, "b": b}, seed=0)
    assert len(ds) == 10

    item = ds[5]
    assert item["a"] == ("a", 5 % 4) and item["b"] == ("b", 5)
    assert ds.num_tokens(5) == max(a.num_tokens(1), b.num_tokens(5))

    # batches are single-corpus and the choice is seed-deterministic
    picks = set()
    for _ in range(20):
        batch = ds.collater([ds[i] for i in (0, 1, 2)])
        tags = {t for t, _ in batch["items"]}
        assert len(tags) == 1
        picks |= tags
    assert picks == {"a", "b"}  # both corpora get sampled eventually

    ds2 = MultiCorpusSampledDataset({"a": a, "b": b}, seed=0)
    seq1 = [ds.collater([ds[0]])["items"][0][0] for _ in range(8)]
    ds.set_epoch(3), ds2.set_epoch(3)
    seq_a = [ds.collater([ds[0]])["items"][0][0] for _ in range(8)]
    seq_b = [ds2.collater([ds2[0]])["items"][0][0] for _ in range(8)]
    assert seq_a == seq_b  # same epoch seed -> same corpus schedule

    # explicit sampling_func overrides the RNG
    only_b = MultiCorpusSampledDataset({"a": a, "b": b}, sampling_func=lambda keys: "b")
    assert all(t == "b" for t, _ in only_b.collater([only_b[0], only_b[1]])["items"])


def test_colorize_dataset():
    """reference: data/colorize_dataset.py — collated batches gain a
    per-sentence integer 'colors' entry from color_getter(dataset, id)."""
    from chimera_st_tpu.data.wrappers import ColorizeDataset

    class DictDataset(FakeDataset):
        def __getitem__(self, i):
            return {"id": i, "tag": self.tag}

        def collater(self, samples, **kwargs):
            return {"id": np.asarray([s["id"] for s in samples])}

    base = DictDataset(5, "x")
    ds = ColorizeDataset(base, color_getter=lambda d, i: 100 + i * 2)
    batch = ds.collater([ds[0], ds[3]])
    np.testing.assert_array_equal(batch["colors"], [100, 106])
    assert batch["colors"].dtype == np.int32
    assert ds.num_tokens(3) == base.num_tokens(3)


def test_streaming_epoch_batch_iterator():
    """reference: iterators.py:142-193 — epoch iteration over an unsized
    streaming dataset: set_epoch forwarded, shard slicing, truthful
    end_of_epoch, epoch-granular state_dict."""
    from chimera_st_tpu.data.iterators import StreamingEpochBatchIterator

    class Stream:
        def __init__(self):
            self.epochs = []

        def set_epoch(self, epoch):
            self.epochs.append(epoch)
            self._items = [f"e{epoch}b{i}" for i in range(5)]

        def __iter__(self):
            return iter(self._items)

    s = Stream()
    it = StreamingEpochBatchIterator(s)
    epoch1 = list(it.next_epoch_itr())
    assert epoch1 == ["e1b0", "e1b1", "e1b2", "e1b3", "e1b4"]
    assert it.end_of_epoch()
    assert it.iterations_in_epoch == 5
    assert it.next_epoch_idx == 2

    # mid-epoch: end_of_epoch is false while elements remain
    itr = it.next_epoch_itr()
    next(itr)
    assert not it.end_of_epoch()
    assert s.epochs == [1, 2]

    # sharding takes every num_shards-th element
    sh = StreamingEpochBatchIterator(Stream(), num_shards=2, shard_id=1)
    assert list(sh.next_epoch_itr()) == ["e1b1", "e1b3"]

    # state_dict restores the epoch counter
    st = it.state_dict()
    fresh = StreamingEpochBatchIterator(Stream())
    fresh.load_state_dict(st)
    assert list(fresh.next_epoch_itr())[0] == "e2b0"

    # with the background prefetcher: end_of_epoch after exhaustion must not
    # block on the drained queue (regression: sentinel consumed once only)
    pf = StreamingEpochBatchIterator(Stream(), buffer_size=2)
    assert len(list(pf.next_epoch_itr())) == 5
    assert pf.end_of_epoch()
    assert [b[-2:] for b in pf.next_epoch_itr()][:2] == ["b0", "b1"]


def test_multi_corpus_dataset_per_item():
    """reference: data/multi_corpus_dataset.py — corpus drawn PER SAMPLE from
    an explicit distribution; internal indices come from reshuffled
    permutations that rewind; one collater serves mixed batches; set_epoch
    redraws (can_reuse_epoch_itr_across_epochs=False)."""
    from chimera_st_tpu.data.wrappers import MultiCorpusDataset

    a, b = FakeDataset(40, "a"), FakeDataset(60, "b")
    ds = MultiCorpusDataset({"a": a, "b": b}, [0.9, 0.1], seed=0)
    assert len(ds) == 100

    tags = [ds[i][0] for i in range(100)]
    # 0.9/0.1 split, i.i.d. draws over 100 slots: expect a heavy 'a' majority
    assert 75 <= tags.count("a") <= 99

    # within one epoch, a corpus's indices don't repeat before the corpus is
    # exhausted (permutation-without-replacement semantics)
    a_indices = [ds[i][1] for i in range(100) if ds[i][0] == "a"]
    first_pass = a_indices[: min(len(a_indices), 40)]
    assert len(set(first_pass)) == len(first_pass)

    # mixed batch collates through the shared collater
    batch = ds.collater([ds[0], ds[1], ds[2]])
    assert len(batch["items"]) == 3

    # deterministic per (seed, epoch); redraw on set_epoch
    ds2 = MultiCorpusDataset({"a": a, "b": b}, [0.9, 0.1], seed=0)
    assert [ds2[i] for i in range(100)] == [ds[i] for i in range(100)]
    before = [ds[i] for i in range(100)]
    ds.set_epoch(2)
    after = [ds[i] for i in range(100)]
    assert before != after
    ds2.set_epoch(2)
    assert after == [ds2[i] for i in range(100)]

    # num_tokens/size follow the mapped member
    key, inner = ds._map_index(0)
    assert ds.num_tokens(0) == (a if key == "a" else b).num_tokens(inner)

    # heterogeneous member types are rejected (reference asserts same type)
    class Other(FakeDataset):
        pass

    with pytest.raises(ValueError):
        MultiCorpusDataset({"a": a, "o": Other(3, "o")}, [0.5, 0.5])


def test_multi_corpus_dataset_rejects_empty_member():
    from chimera_st_tpu.data.wrappers import MultiCorpusDataset

    with pytest.raises(ValueError):
        MultiCorpusDataset({"a": FakeDataset(4, "a"), "b": FakeDataset(0, "b")},
                           [0.9, 0.1])
