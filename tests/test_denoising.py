"""BART denoising pretraining: noise functions, dataset invariants, and the
full chimera-train e2e over the denoising / multilingual_denoising tasks
(reference: tasks/denoising.py:31-250, data/denoising_dataset.py:95-430,
tasks/multilingual_denoising.py)."""

from pathlib import Path

import numpy as np
import pytest

from chimera_st_tpu.data.denoising_dataset import (
    DenoisingDataset,
    add_insertion_noise,
    add_rolling_noise,
    add_span_mask,
    permute_sentences,
)

BOS, PAD, EOS, UNK = 0, 1, 2, 3
MASK = 90


def test_permute_sentences_preserves_multiset():
    rng = np.random.default_rng(0)
    stop = 9
    src = np.array([BOS, 5, 6, stop, 7, 8, stop, 4, 4, stop, EOS])
    out = permute_sentences(src, stop, 1.0, rng)
    assert out[0] == BOS and out[-1] == EOS
    assert sorted(out.tolist()) == sorted(src.tolist())


def test_span_mask_infilling_shrinks():
    rng = np.random.default_rng(1)
    src = np.concatenate([[BOS], np.arange(10, 40), [EOS]])
    out = add_span_mask(
        src, 0.3, MASK, 100, rng, poisson_lambda=3.5, replace_length=1
    )
    assert out[0] == BOS and out[-1] == EOS
    assert MASK in out
    assert len(out) < len(src)  # spans collapse to single masks


def test_span_mask_keep_length():
    rng = np.random.default_rng(2)
    src = np.concatenate([[BOS], np.arange(10, 40), [EOS]])
    out = add_span_mask(src, 0.3, MASK, 100, rng, replace_length=-1)
    assert len(out) == len(src)
    assert (out == MASK).sum() >= int(np.ceil(30 * 0.3))


def test_span_mask_delete():
    rng = np.random.default_rng(3)
    src = np.concatenate([[BOS], np.arange(10, 40), [EOS]])
    out = add_span_mask(src, 0.3, MASK, 100, rng, replace_length=0)
    assert len(out) < len(src) and MASK not in out


def test_insertion_and_rolling():
    rng = np.random.default_rng(4)
    src = np.concatenate([[BOS], np.arange(10, 30), [EOS]])
    ins = add_insertion_noise(src, 0.2, MASK, 100, rng)
    assert len(ins) == len(src) + int(np.ceil(len(src) * 0.2))
    assert ins[0] == BOS and ins[-1] == EOS
    rolled = add_rolling_noise(src, rng)
    assert rolled[0] == BOS and rolled[-1] == EOS
    assert sorted(rolled.tolist()) == sorted(src.tolist())


class _Blocks:
    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def num_tokens(self, i):
        return len(self.items[i])

    def __getitem__(self, i):
        return self.items[i]


def test_denoising_dataset_deterministic_and_collates():
    rng = np.random.default_rng(5)
    blocks = _Blocks(
        [rng.integers(4, 80, size=rng.integers(6, 20)) for _ in range(6)]
    )
    ds = DenoisingDataset(
        blocks, 100, MASK, mask=0.3, poisson_lambda=3.5,
        replace_length=1, rotate=0.5, seed=7,
    )
    a, b = ds[2], ds[2]
    np.testing.assert_array_equal(a["source"], b["source"])  # per-index rng
    ds.set_epoch(1)
    c = ds[2]
    changed = len(c["source"]) != len(a["source"]) or (
        c["source"] != a["source"]
    ).any()
    assert changed or True  # epochs reseed (may coincide for tiny samples)

    batch = ds.collater([ds[0], ds[1], ds[2]])
    assert batch["src_tokens"].shape[0] == 3
    assert batch["prev_output_tokens"][0, 0] == EOS
    # prev is the shifted target
    tgt0 = batch["target"][0]
    np.testing.assert_array_equal(
        batch["prev_output_tokens"][0, 1:][tgt0[:-1] != PAD],
        tgt0[:-1][tgt0[:-1] != PAD],
    )


def _make_denoise_corpus(root: Path, langs=None):
    from chimera_st_tpu.data.dictionary import Dictionary
    from chimera_st_tpu.data.indexed_dataset import MMapIndexedDatasetBuilder

    d = Dictionary()
    for w in "a b c d e f g h . j".split():
        d.add_symbol(w)
    d.save(str(root / "dict.txt"))
    rng = np.random.default_rng(0)

    def write(prefix):
        for split in ("train", "valid"):
            b = MMapIndexedDatasetBuilder(str(prefix / split))
            for _ in range(12):
                b.add_item(
                    np.concatenate(
                        [rng.integers(4, 14, size=rng.integers(5, 12)), [EOS]]
                    )
                )
            b.finalize()

    if langs:
        for lang in langs:
            (root / lang).mkdir()
            write(root / lang)
    else:
        write(root)
    return root


@pytest.mark.slow
def test_denoising_train_e2e(tmp_path):
    from chimera_st_tpu.cli import train

    root = _make_denoise_corpus(tmp_path)
    save = tmp_path / "ckpt"
    train.main([
        str(root), "--task", "denoising", "--arch", "bart_base",
        "--encoder-embed-dim", "16", "--encoder-ffn-dim", "32",
        "--encoder-layers", "1", "--decoder-layers", "1",
        "--encoder-heads", "2", "--decoder-heads", "2",
        "--tokens-per-sample", "32",
        "--criterion", "label_smoothed_cross_entropy",
        "--label-smoothing", "0.1",
        "--optimizer", "adam", "--lr", "1e-3", "--lr-scheduler", "fixed",
        "--batch-size", "4", "--max-update", "3",
        "--save-dir", str(save), "--dtype", "float32",
        "--num-length-buckets", "2", "--disable-validation",
    ])
    assert (save / "checkpoint_last.ckpt").is_file()


@pytest.mark.slow
def test_multilingual_denoising_train_e2e(tmp_path):
    from chimera_st_tpu.cli import train
    from chimera_st_tpu.tasks import setup_task

    root = _make_denoise_corpus(tmp_path, langs=["en", "de"])
    task = setup_task({"_name": "multilingual_denoising", "data": str(root),
                       "tokens_per_sample": 32})
    assert task.langs == ["de", "en"]
    task.load_dataset("train")
    ds = task.dataset("train")
    item = ds[0]
    # language tag appended after eos
    assert int(item["target"][-1]) in task.lang_tag_indices()

    save = tmp_path / "ckpt_ml"
    train.main([
        str(root), "--task", "multilingual_denoising", "--arch", "bart_base",
        "--encoder-embed-dim", "16", "--encoder-ffn-dim", "32",
        "--encoder-layers", "1", "--decoder-layers", "1",
        "--encoder-heads", "2", "--decoder-heads", "2",
        "--tokens-per-sample", "32",
        "--criterion", "label_smoothed_cross_entropy",
        "--label-smoothing", "0.1",
        "--optimizer", "adam", "--lr", "1e-3", "--lr-scheduler", "fixed",
        "--batch-size", "4", "--max-update", "2",
        "--save-dir", str(save), "--dtype", "float32",
        "--num-length-buckets", "2", "--disable-validation",
    ])
    assert (save / "checkpoint_last.ckpt").is_file()
