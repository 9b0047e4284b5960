"""Regression tests for the data-layer review fixes (epoch sequencing,
resume cost, denoising lang tags, transform config resolution, fastBPE
codes, crop reachability, duplicate dicts, token-block construction)."""

import numpy as np
import pytest

from chimera_st_tpu.data.iterators import (
    CountingIterator,
    EpochBatchIterator,
    GroupedIterator,
    StreamingEpochBatchIterator,
)


class _EpochRecorder:
    def __init__(self, n=6):
        self.n = n
        self.epochs = []

    def set_epoch(self, e):
        self.epochs.append(e)

    def __iter__(self):
        return iter(range(self.n))


@pytest.mark.quick
def test_streaming_iterator_epoch_sequence():
    """next_epoch() + next_epoch_itr() advance by exactly ONE epoch (the
    exhausted iterator used to double-advance, desyncing (seed, epoch)
    data orders between straight-through and resumed runs)."""
    ds = _EpochRecorder()
    it = StreamingEpochBatchIterator(ds, epoch=1)
    for epoch in (1, 2, 3):
        itr = it.next_epoch_itr()
        assert list(itr) == list(range(6))
        it.next_epoch()
    assert ds.epochs == [1, 2, 3]


@pytest.mark.quick
def test_mid_epoch_resume_skips_without_collating():
    """Resume must not collate the already-consumed batches (used to pull
    every skipped batch through the prefetcher)."""
    collated = []

    def collate(idx):
        collated.append(tuple(idx))
        return tuple(idx)

    batches = [np.asarray([i]) for i in range(10)]
    it = EpochBatchIterator(collate, batches, seed=0, buffer_size=0)
    it.load_state_dict({"epoch": 1, "iterations_in_epoch": 7, "shuffle": False})
    # the offset is visible BEFORE the resumed iterator is consumed
    assert it.iterations_in_epoch == 7
    itr = it.next_epoch_itr(shuffle=False)
    rest = list(itr)
    assert len(rest) == 3
    assert len(collated) == 3  # none of the 7 skipped batches was collated
    assert itr.n == 10


@pytest.mark.quick
def test_grouped_iterator_streaming_and_api():
    """GroupedIterator over an unsized source: len reports 0 (unknown) but
    iteration and has_next work; inherited skip() consumes whole groups."""
    src = CountingIterator(iter(range(7)), total=None)
    g = GroupedIterator(src, 2)
    assert g.has_next()
    assert next(g) == [0, 1]
    g.skip(1)  # skips group [2, 3]
    assert next(g) == [4, 5]
    assert next(g) == [6]
    assert not g.has_next()


@pytest.mark.quick
def test_skip_counts_a_pending_peek():
    """has_next() stashes the next element; an immediate skip(n) must count
    it as the FIRST skipped item — the stale peek used to be yielded out of
    order after the skipped window (review fix)."""
    src = CountingIterator(iter(range(6)), total=None)
    assert src.has_next()  # peeks 0
    src.skip(2)  # must skip 0 and 1
    assert next(src) == 2
    assert src.n == 3

    g = GroupedIterator(CountingIterator(iter(range(8)), total=None), 2)
    assert g.has_next()  # peeks [0, 1]
    g.skip(2)  # must skip [0,1] and [2,3]
    assert next(g) == [4, 5]


@pytest.mark.quick
def test_grouped_iterator_resumed_inner_counters():
    """A mid-epoch-resumed CountingIterator (n=offset) wrapped in
    GroupedIterator must report group counters scaled like the reference
    (start=ceil(n/chunk)), not a full epoch (review fix)."""
    inner = CountingIterator(iter(range(4, 10)), start=4, total=10)
    g = GroupedIterator(inner, 2)
    assert g.total == 5  # ceil(10/2)
    assert g.n == 2  # ceil(4/2) groups already consumed
    chunks = list(g)
    assert chunks == [[4, 5], [6, 7], [8, 9]]
    assert g.n == 5
    assert not g.has_next()


@pytest.mark.quick
def test_denoising_prev_keeps_appended_lang_tag():
    """Multilingual denoising: the appended language tag (the row's final
    target token) leads prev_output_tokens (fairseq move_eos_to_beginning
    with the dataset-level end token)."""
    from chimera_st_tpu.data.denoising_dataset import DenoisingDataset

    class Toy:
        def __init__(self):
            self.items = [np.asarray([0, 5, 6, 7, 2], np.int64)]

        def __len__(self):
            return 1

        def __getitem__(self, i):
            return self.items[i]

        def num_tokens(self, i):
            return len(self.items[i])

    TAG = 9
    ds = DenoisingDataset(
        Toy(), vocab_size=10, mask_idx=8, pad=1, eos=2, bos=0,
        mask=0.0, insert=0.0, permute_sentence_ratio=0.0, rotate=0.0,
        append_tokens=np.asarray([TAG], np.int64),
    )
    batch = ds.collater([ds[0]])
    assert batch["target"][0].tolist()[-1] == TAG
    prev = batch["prev_output_tokens"][0].tolist()
    assert prev[0] == TAG  # rotated actual last token, not hard-coded eos


@pytest.mark.quick
def test_transform_params_from_top_level_config(tmp_path):
    """Reference config_wave.yaml layout: per-transform params sit at the
    TOP level next to `transforms:`; plain split keys resolve first."""
    from chimera_st_tpu.data.manifests import S2TDataConfig

    (tmp_path / "config_wave.yaml").write_text(
        "input_feat_per_channel: 80\n"
        "transforms:\n"
        "  train_custom: [specaugment]\n"
        "  _train: [utterance_cmvn]\n"
        "specaugment:\n"
        "  freq_mask_N: 3\n"
        "  freq_mask_F: 11\n"
        "  time_mask_N: 1\n"
        "  time_mask_T: 17\n"
        "  time_mask_p: 1.0\n"
    )
    cfg = S2TDataConfig(str(tmp_path / "config_wave.yaml"))
    # exact split key wins over the _train wildcard (reference order)
    assert cfg.get_feature_transforms("train_custom", True) == ["specaugment"]
    assert cfg.get_feature_transforms("train_other", True) == ["utterance_cmvn"]

    from chimera_st_tpu.data.feature_transforms import (
        CompositeAudioFeatureTransform,
        SpecAugmentTransform,
    )

    comp = CompositeAudioFeatureTransform.from_config_dict(
        {**{k: v for k, v in cfg.config.items() if k != "transforms"},
         "transforms": cfg.get_feature_transforms("train_custom", True)}
    )
    sa = comp.transforms[0]
    assert isinstance(sa, SpecAugmentTransform)
    assert sa.freq_mask_n == 3 and sa.freq_mask_f == 11 and sa.time_mask_t == 17


@pytest.mark.quick
def test_fastbpe_three_column_codes(tmp_path):
    """fastBPE learnbpe emits 'a b count' lines; they must load as merges."""
    from chimera_st_tpu.config.registry import BPE

    codes = tmp_path / "codes"
    codes.write_text("l o 100\nlo w 50\nlow e</w> 10\n")
    bpe = BPE.get("fastbpe")({"bpe_codes": str(codes)})
    out = bpe.encode("low")
    # merges applied: 'low' never falls apart into bare characters
    assert "l@@ o@@ w" != out
    assert bpe.decode(out) == "low"


@pytest.mark.quick
def test_dictionary_duplicate_raises(tmp_path):
    from chimera_st_tpu.data.dictionary import Dictionary

    f = tmp_path / "dict.txt"
    f.write_text("hello 10\nworld 5\nhello 3\n")
    d = Dictionary()
    with pytest.raises(RuntimeError, match="Duplicate"):
        d.add_from_file(str(f))


@pytest.mark.quick
def test_raw_audio_crop_reaches_last_window(tmp_path):
    """len == max_sample_size + 1 must allow start == 1 (the old
    high-exclusive draw pinned start to 0 forever)."""
    from chimera_st_tpu.data.raw_audio_dataset import RawAudioDataset

    wav = np.arange(101, dtype=np.float32)
    np.save(tmp_path / "w.npy", wav)
    rows = [{"audio": str(tmp_path / "w.npy"), "n_frames": "101"}]
    ds = RawAudioDataset(rows, max_sample_size=100, min_sample_size=1, seed=0)
    starts = {int(ds[0][0]) for _ in range(64)}
    assert starts == {0, 1}


@pytest.mark.quick
def test_token_block_no_getitem_at_construction():
    from chimera_st_tpu.data.token_block_dataset import TokenBlockDataset

    class Counting:
        def __init__(self, arrs):
            self.arrs = arrs
            self.gets = 0

        def __len__(self):
            return len(self.arrs)

        def __getitem__(self, i):
            self.gets += 1
            return self.arrs[i]

    arrs = [np.arange(n, dtype=np.int64) for n in (5, 3, 7, 2, 6)]
    sizes = np.asarray([len(a) for a in arrs])
    ds = Counting(arrs)
    tb = TokenBlockDataset(ds, sizes, block_size=6, break_mode="none")
    assert ds.gets == 0  # construction is pure arithmetic
    # lengths still correct vs brute force
    stream = np.concatenate(arrs)
    expect = [len(stream[s:s + 6]) for s in range(0, len(stream), 6)]
    assert tb.sizes.tolist() == expect
