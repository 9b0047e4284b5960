"""Text-task ensemble decoding (VERDICT r1 item 5): e2e through the CLI —
train two tiny MT checkpoints, generate with --path a.ckpt:b.ckpt, and with
--lm-path shallow fusion (reference: fairseq_cli/generate.py:103-128)."""

from pathlib import Path

import numpy as np
import pytest

from tests.synthetic_data import TINY_ARCH_FLAGS, make_parallel_text


MT_ARCH_FLAGS = [
    "--encoder-embed-dim", "16", "--encoder-ffn-dim", "32",
    "--encoder-layers", "1", "--encoder-heads", "2",
    "--decoder-embed-dim", "16", "--decoder-ffn-dim", "32",
    "--decoder-layers", "1", "--decoder-heads", "2",
]


@pytest.fixture(scope="module")
def mt_setup(tmp_path_factory):
    from chimera_st_tpu.cli import preprocess, train

    tmp_path = tmp_path_factory.mktemp("ens_text")
    raw = make_parallel_text(str(tmp_path / "raw"))
    bin_dir = str(tmp_path / "bin")
    preprocess.main([
        "-s", "de", "-t", "en",
        "--trainpref", f"{raw}/train", "--validpref", f"{raw}/valid",
        "--destdir", bin_dir, "--joined-dictionary",
    ])

    def train_one(save_dir, seed):
        train.main([
            bin_dir, "--task", "translation", "-s", "de", "-t", "en",
            "--arch", "transformer_iwslt_de_en", *MT_ARCH_FLAGS,
            "--criterion", "label_smoothed_cross_entropy",
            "--label-smoothing", "0.1",
            "--optimizer", "adam", "--lr", "1e-3",
            "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "2",
            "--batch-size", "8", "--save-dir", save_dir,
            "--max-update", "2", "--dtype", "float32",
            "--seed", str(seed), "--disable-validation",
            "--num-length-buckets", "2",
        ])
        return str(Path(save_dir) / "checkpoint_last.ckpt")

    a = train_one(str(tmp_path / "m1"), 1)
    b = train_one(str(tmp_path / "m2"), 2)
    return bin_dir, a, b, tmp_path


def test_text_ensemble_generate_cli(mt_setup, tmp_path):
    from chimera_st_tpu.cli import generate

    bin_dir, a, b, _ = mt_setup
    out_dir = str(tmp_path / "gen")
    Path(out_dir).mkdir()
    generate.main([
        bin_dir, "--task", "translation", "-s", "de", "-t", "en",
        "--path", f"{a}:{b}",
        "--gen-subset", "valid", "--beam", "2", "--max-decode-len", "8",
        "--batch-size", "8", "--dtype", "float32",
        "--results-path", out_dir, "--num-length-buckets", "2",
    ])
    text = (Path(out_dir) / "generate-valid.txt").read_text()
    assert "H-" in text and "Generate valid with beam=2" in text


def test_text_ensemble_lm_fusion_cli(mt_setup, tmp_path):
    from chimera_st_tpu.cli import generate, train
    from chimera_st_tpu.data.indexed_dataset import MMapIndexedDatasetBuilder

    bin_dir, a, _, root = mt_setup

    # LM corpus over the SAME joined dictionary
    lm_dir = root / "lm_data"
    lm_dir.mkdir(exist_ok=True)
    import shutil

    shutil.copy(Path(bin_dir) / "dict.en.txt", lm_dir / "dict.txt")
    rng = np.random.default_rng(0)
    for split in ("train", "valid"):
        bld = MMapIndexedDatasetBuilder(str(lm_dir / split))
        for _ in range(16):
            bld.add_item(
                np.concatenate([rng.integers(4, 10, size=rng.integers(3, 7)), [2]])
            )
        bld.finalize()

    lm_ckpt_dir = str(root / "lm_ckpt")
    train.main([
        str(lm_dir), "--task", "language_modeling",
        "--arch", "transformer_lm",
        "--embed-dim", "16", "--ffn-dim", "32", "--layers", "1", "--heads", "2",
        "--tokens-per-sample", "16",
        "--criterion", "cross_entropy",
        "--optimizer", "adam", "--lr", "1e-3", "--lr-scheduler", "inverse_sqrt",
        "--warmup-updates", "2", "--batch-size", "8", "--max-update", "2",
        "--save-dir", lm_ckpt_dir, "--dtype", "float32",
        "--disable-validation", "--num-length-buckets", "2",
    ])
    lm_ckpt = str(Path(lm_ckpt_dir) / "checkpoint_last.ckpt")

    out_dir = str(tmp_path / "gen_lm")
    Path(out_dir).mkdir()
    generate.main([
        bin_dir, "--task", "translation", "-s", "de", "-t", "en",
        "--path", a, "--lm-path", lm_ckpt, "--lm-weight", "0.3",
        "--gen-subset", "valid", "--beam", "2", "--max-decode-len", "8",
        "--batch-size", "8", "--dtype", "float32",
        "--results-path", out_dir, "--num-length-buckets", "2",
    ])
    text = (Path(out_dir) / "generate-valid.txt").read_text()
    assert "H-" in text
