"""Seq2seq hub interface (reference: fairseq/hub_utils.py
from_pretrained + GeneratorHubInterface)."""

from pathlib import Path

import numpy as np
import pytest

from tests.synthetic_data import TINY_ARCH_FLAGS, make_parallel_text


@pytest.mark.slow
def test_hub_from_pretrained_translate(tmp_path):
    from chimera_st_tpu.cli import preprocess, train
    import chimera_st_tpu.hub as hub

    raw = make_parallel_text(str(tmp_path / "raw"))
    bin_dir = str(tmp_path / "bin")
    preprocess.main([
        "-s", "de", "-t", "en",
        "--trainpref", f"{raw}/train", "--validpref", f"{raw}/valid",
        "--destdir", bin_dir, "--joined-dictionary",
    ])
    save = str(tmp_path / "ckpt")
    train.main([
        bin_dir, "--task", "translation", "-s", "de", "-t", "en",
        "--arch", "s2t_transformer_w2v2_interlingua_base", *TINY_ARCH_FLAGS,
        "--criterion", "label_smoothed_cross_entropy",
        "--optimizer", "adam", "--lr", "1e-3", "--lr-scheduler", "fixed",
        "--batch-size", "8", "--save-dir", save, "--max-update", "2",
        "--dtype", "float32", "--num-length-buckets", "2",
    ])

    m = hub.from_pretrained(
        f"{save}/checkpoint_last.ckpt", data_dir=bin_dir,
        task="translation", source_lang="de", target_lang="en",
    )
    # encode/decode roundtrip through the dictionary
    ids = m.encode("haus katze")
    assert ids[-1] == m.src_dict.eos()
    assert m.decode(ids) == "haus katze"

    hyps = m.translate(["haus katze", "hund"], beam=2, max_decode_len=8)
    assert len(hyps) == 2 and all(isinstance(h, str) for h in hyps)

    nbest = m.generate(["haus katze"], beam=2, nbest=2, max_decode_len=8)
    assert len(nbest[0]) == 2
    assert nbest[0][0]["score"] >= nbest[0][1]["score"]

    samp = m.sample(["haus katze"], sampling_topk=5, max_decode_len=8)
    assert len(samp) == 1 and isinstance(samp[0], str)


@pytest.mark.slow
def test_hub_bart_fill_mask(tmp_path):
    """fill_mask over a denoising-pretrained BART (reference:
    models/bart/hub_interface.py:166-201)."""
    import chimera_st_tpu.hub as hub
    from chimera_st_tpu.cli import train
    from tests.test_denoising import _make_denoise_corpus

    root = _make_denoise_corpus(tmp_path)
    save = tmp_path / "ckpt"
    train.main([
        str(root), "--task", "denoising", "--arch", "bart_base",
        "--encoder-embed-dim", "16", "--encoder-ffn-dim", "32",
        "--encoder-layers", "1", "--decoder-layers", "1",
        "--encoder-heads", "2", "--decoder-heads", "2",
        "--tokens-per-sample", "32",
        "--criterion", "label_smoothed_cross_entropy",
        "--optimizer", "adam", "--lr", "1e-3", "--lr-scheduler", "fixed",
        "--batch-size", "4", "--max-update", "2",
        "--save-dir", str(save), "--dtype", "float32",
        "--num-length-buckets", "2", "--disable-validation",
    ])

    m = hub.from_pretrained(
        f"{save}/checkpoint_last.ckpt", data_dir=str(root), task="denoising",
    )
    mask_sym = next(
        s for s in ("<mask>",) if m.src_dict.index(s) != m.src_dict.unk()
    )
    out = m.fill_mask(f"w1 w2 {mask_sym} w4", topk=3, max_decode_len=12)
    assert len(out) == 3
    assert all(isinstance(t, str) and isinstance(s, float) for t, s in out)
    assert out[0][1] >= out[-1][1]  # best-first
