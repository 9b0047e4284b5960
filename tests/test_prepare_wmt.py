"""WMT prep pipeline on a local mini-corpus fixture (VERDICT r1 item 9):
normalize -> tokenize -> clean -> learn joint BPE -> apply -> preprocess ->
MT train (reference: chimera/prepare_data/prepare-wmt-en2any.sh)."""

from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

SRC_SENTS = [
    "The committee discussed the new proposal yesterday.",
    "We believe that this approach will work well…",
    "Markets reacted “strongly” to the announcement.",
    "The quick brown fox jumps over the lazy dog.",
    "International cooperation remains essential for progress.",
    "She said the results were better than expected.",
]
TGT_SENTS = [
    "Der Ausschuss diskutierte gestern den neuen Vorschlag.",
    "Wir glauben, dass dieser Ansatz gut funktionieren wird…",
    "Die Märkte reagierten „stark“ auf die Ankündigung.",
    "Der schnelle braune Fuchs springt über den faulen Hund.",
    "Internationale Zusammenarbeit bleibt für den Fortschritt wesentlich.",
    "Sie sagte, die Ergebnisse seien besser als erwartet.",
]


def _fixture(root: Path, n_rep: int = 8):
    orig = root / "orig"
    orig.mkdir(parents=True)
    with open(orig / "mini.de-en.en", "w") as fe, open(orig / "mini.de-en.de", "w") as fd:
        for _ in range(n_rep):
            for e, d in zip(SRC_SENTS, TGT_SENTS):
                fe.write(e + "\n")
                fd.write(d + "\n")
    # one degenerate pair that the cleaner must drop (ratio filter)
    with open(orig / "mini.de-en.en", "a") as fe, open(orig / "mini.de-en.de", "a") as fd:
        fe.write("a\n")
        fd.write(" ".join(["wort"] * 40) + "\n")


def test_prepare_wmt_to_mt_train_e2e(tmp_path):
    from chimera_st_tpu.cli import preprocess, train
    from chimera_st_tpu.tools import prepare_wmt

    _fixture(tmp_path)
    prepare_wmt.main([
        "--data-dir", str(tmp_path), "--target", "de",
        "--corpora", "mini.de-en", "--subword-tokens", "60",
        "--valid-frac", "0.2",
    ])
    out = tmp_path / "wmt_en_de"
    assert (out / "codes.en-de").is_file()
    train_en = (out / "train.en").read_text().splitlines()
    assert len(train_en) > 0
    # punctuation normalized + BPE markers present
    joined = " ".join(train_en)
    assert "“" not in joined and "…" not in joined
    assert "@@" in joined
    # the degenerate ratio pair was cleaned out
    total = sum(
        len((out / f"{s}.en").read_text().splitlines())
        for s in ("train", "valid", "test")
    )
    assert total == 8 * len(SRC_SENTS)

    bin_dir = str(tmp_path / "bin")
    preprocess.main([
        "-s", "en", "-t", "de", "--joined-dictionary",
        "--trainpref", str(out / "train"), "--validpref", str(out / "valid"),
        "--destdir", bin_dir,
    ])
    save_dir = str(tmp_path / "ckpt")
    train.main([
        bin_dir, "--task", "translation", "-s", "en", "-t", "de",
        "--arch", "transformer_iwslt_de_en",
        "--encoder-embed-dim", "16", "--encoder-ffn-dim", "32",
        "--encoder-layers", "1", "--encoder-heads", "2",
        "--decoder-embed-dim", "16", "--decoder-ffn-dim", "32",
        "--decoder-layers", "1", "--decoder-heads", "2",
        "--criterion", "label_smoothed_cross_entropy", "--label-smoothing", "0.1",
        "--optimizer", "adam", "--lr", "1e-3", "--lr-scheduler", "inverse_sqrt",
        "--warmup-updates", "2", "--batch-size", "8", "--max-update", "2",
        "--save-dir", save_dir, "--dtype", "float32",
        "--disable-validation", "--num-length-buckets", "2",
    ])
    assert (Path(save_dir) / "checkpoint_last.ckpt").is_file()


def test_apply_spm_tool(tmp_path):
    # train nothing — reuse the synthetic SPM fixture path used elsewhere if
    # present; otherwise just exercise the CLI arg surface with a tiny model
    from chimera_st_tpu.data import spm as spm_mod

    if not hasattr(spm_mod, "SentencePieceUnigram"):
        pytest.skip("native SPM unavailable")
    # minimal hand-built unigram model via the module's own writer, if any —
    # fall back to checking the tool imports and errors cleanly on bad input
    from chimera_st_tpu.tools import apply_spm

    with pytest.raises(Exception):
        apply_spm.main([
            "--input-file", str(tmp_path / "missing.txt"),
            "--output-file", str(tmp_path / "out.txt"),
            "--model", str(tmp_path / "missing.model"),
        ])
