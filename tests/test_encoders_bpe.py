"""Subword encoders + LR schedulers (VERDICT r1 item 10).

reference semantics: fairseq/data/encoders/{gpt2_bpe,subword_nmt_bpe,fastbpe,
byte_bpe}.py; fairseq/optim/lr_scheduler/{triangular_lr_scheduler,
reduce_lr_on_plateau}.py."""

import json

import numpy as np
import pytest

from chimera_st_tpu.data.encoders import build_bpe


def _mini_gpt2_assets(tmp_path):
    """Tiny byte-level BPE: merges 'he' 'll' 'hell' 'llo' ... over ascii."""
    from chimera_st_tpu.data.encoders_bpe import bytes_to_unicode

    b2u = bytes_to_unicode()
    # base vocab = all byte chars; then merged symbols
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"), ("Ġ", "w")]
    symbols = [b2u[b] for b in range(256)] + ["".join(m) for m in merges]
    encoder = {s: i for i, s in enumerate(symbols)}
    (tmp_path / "encoder.json").write_text(json.dumps(encoder))
    (tmp_path / "vocab.bpe").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n"
    )
    return str(tmp_path / "encoder.json"), str(tmp_path / "vocab.bpe")


def test_gpt2_bpe_roundtrip(tmp_path):
    enc_json, vocab_bpe = _mini_gpt2_assets(tmp_path)
    bpe = build_bpe({"_name": "gpt2",
                     "gpt2_encoder_json": enc_json, "gpt2_vocab_bpe": vocab_bpe})
    ids = bpe.encode("hello world")
    assert all(t.isdigit() for t in ids.split())
    assert bpe.decode(ids) == "hello world"
    # 'hello' merges fully into one symbol
    from chimera_st_tpu.data.encoders_bpe import bytes_to_unicode

    first = int(ids.split()[0])
    assert bpe.decoder[first] == "hello"


def test_subword_nmt_and_fastbpe(tmp_path):
    codes = tmp_path / "codes"
    codes.write_text(
        "#version: 0.2\nl l\nll o</w>\nh e\nhe llo</w>\nw o\nwo r\nwor l\nworl d</w>\n"
    )
    for name in ("subword_nmt", "fastbpe"):
        bpe = build_bpe({"_name": name, "bpe_codes": str(codes)})
        enc = bpe.encode("hello world unknownword")
        assert bpe.decode(enc) == "hello world unknownword"
        assert "hello" in enc.split()  # fully merged
        assert "world" in enc.split()
        # partially-merged word keeps @@ continuation
        assert any(p.endswith("@@") for p in enc.split())


def test_byte_bpe_roundtrip():
    from chimera_st_tpu.data.encoders_bpe import (
        byte_decode,
        byte_encode,
        smart_byte_decode,
    )

    s = "héllo wörld"
    assert byte_decode(byte_encode(s)) == s
    # broken byte stream: best-effort recovery drops the dangling byte
    enc = byte_encode(s)[:-1]
    out = smart_byte_decode(enc)
    assert "llo" in out


def test_triangular_schedule():
    from chimera_st_tpu.optim import build_lr_schedule

    s = build_lr_schedule({"_name": "triangular", "lr": 1e-4, "max_lr": 1e-3,
                           "lr_period_updates": 100, "lr_shrink": 0.5})
    assert float(s(0)) == pytest.approx(1e-4)
    assert float(s(50)) == pytest.approx(1e-3)  # peak mid-cycle
    assert float(s(100)) == pytest.approx(1e-4)  # back to min
    assert float(s(150)) == pytest.approx(5e-4)  # next cycle peak shrunk 0.5x


def test_reduce_lr_on_plateau():
    from chimera_st_tpu.optim import build_lr_schedule

    s = build_lr_schedule({"_name": "reduce_lr_on_plateau", "lr": 1e-3,
                           "lr_shrink": 0.1, "lr_patience": 1})
    assert float(s(10)) == pytest.approx(1e-3)
    assert s.step_val(1.0) is False  # first value becomes best
    assert s.step_val(0.5) is False  # improvement
    assert s.step_val(0.6) is False  # bad 1 <= patience
    assert s.step_val(0.6) is True   # plateau -> shrink
    assert float(s(10)) == pytest.approx(1e-4)
    st = s.state_dict()
    s2 = build_lr_schedule({"_name": "reduce_lr_on_plateau", "lr": 1e-3})
    s2.load_state_dict(st)
    assert float(s2(0)) == pytest.approx(1e-4)


def test_hf_byte_bpe_roundtrip(tmp_path):
    """reference: data/encoders/hf_byte_bpe.py — tokenizers ByteLevelBPE."""
    import json

    from tokenizers import ByteLevelBPETokenizer

    from chimera_st_tpu.config.registry import BPE

    # train a tiny byte-level BPE on a few lines
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("hello world\nhello there\nworld peace\n" * 20)
    tok = ByteLevelBPETokenizer()
    tok.train([str(corpus)], vocab_size=300, min_frequency=1)
    tok.save_model(str(tmp_path))
    enc = BPE.get("hf_byte_bpe")({
        "bpe_vocab": str(tmp_path / "vocab.json"),
        "bpe_merges": str(tmp_path / "merges.txt"),
    })
    ids = enc.encode("hello world")
    assert ids and all(t.isdigit() for t in ids.split())
    assert enc.decode(ids) == "hello world"


def test_hf_bert_bpe_local_vocab(tmp_path):
    """reference: data/encoders/hf_bert_bpe.py — BertTokenizer wordpiece."""
    from chimera_st_tpu.config.registry import BPE

    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "hello", "world", "wo", "##rld", "##llo", "he"]
    ) + "\n")
    enc = BPE.get("hf_bert_bpe")({"bpe_vocab_file": str(vocab)})
    out = enc.encode("hello world")
    assert "hello" in out.split()
    assert enc.decode(out) == "hello world"
    assert enc.is_beginning_of_word("hello")
    assert not enc.is_beginning_of_word("##rld")
