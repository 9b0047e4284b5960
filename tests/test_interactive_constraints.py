"""Interactive CLI lexically-constrained decoding (reference:
fairseq-interactive --constraints, fairseq/search.py:210)."""

from pathlib import Path

import pytest

from tests.synthetic_data import make_parallel_text

pytestmark = pytest.mark.slow


def test_interactive_constraints(tmp_path, capsys, monkeypatch):
    from chimera_st_tpu.cli import interactive, preprocess, train

    raw = make_parallel_text(str(tmp_path / "raw"))
    bin_dir = str(tmp_path / "bin")
    preprocess.main([
        "-s", "de", "-t", "en",
        "--trainpref", f"{raw}/train", "--validpref", f"{raw}/valid",
        "--destdir", bin_dir, "--joined-dictionary",
    ])
    save_dir = str(tmp_path / "ckpt")
    train.main([
        bin_dir, "--task", "translation", "-s", "de", "-t", "en",
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

    inp = tmp_path / "input.txt"
    inp.write_text("der hund\ttree\nder hund\n")
    interactive.main([
        bin_dir, "--task", "translation", "-s", "de", "-t", "en",
        "--path", str(Path(save_dir) / "checkpoint_last.ckpt"),
        "--beam", "4", "--max-decode-len", "12", "--dtype", "float32",
        "--input", str(inp), "--buffer-size", "2", "--constraints",
    ])
    out = capsys.readouterr().out
    lines = out.splitlines()
    h0 = next(l for l in lines if l.startswith("H-0"))
    # the constrained hypothesis must contain the required word
    assert "tree" in h0.split("\t")[2].split(), h0
    assert any(l.startswith("H-1") for l in lines)


def test_interactive_unordered_constraints(tmp_path, capsys):
    """--constraints unordered end to end: BOTH phrases present in the
    hypothesis regardless of the order given on the input line (reference:
    fairseq-interactive --constraints unordered,
    token_generation_constraints.py:202)."""
    from chimera_st_tpu.cli import interactive, preprocess, train

    raw = make_parallel_text(str(tmp_path / "raw"))
    bin_dir = str(tmp_path / "bin")
    preprocess.main([
        "-s", "de", "-t", "en",
        "--trainpref", f"{raw}/train", "--validpref", f"{raw}/valid",
        "--destdir", bin_dir, "--joined-dictionary",
    ])
    save_dir = str(tmp_path / "ckpt")
    train.main([
        bin_dir, "--task", "translation", "-s", "de", "-t", "en",
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

    inp = tmp_path / "input.txt"
    # two single-word phrases; the strategy may satisfy them in any order
    inp.write_text("der hund\ttree\thouse\n")
    interactive.main([
        bin_dir, "--task", "translation", "-s", "de", "-t", "en",
        "--path", str(Path(save_dir) / "checkpoint_last.ckpt"),
        "--beam", "4", "--max-decode-len", "12", "--dtype", "float32",
        "--input", str(inp), "--constraints", "unordered",
    ])
    out = capsys.readouterr().out
    h0 = next(l for l in out.splitlines() if l.startswith("H-0"))
    words = h0.split("\t")[2].split()
    assert "tree" in words and "house" in words, h0
