import io

import numpy as np

from chimera_st_tpu.data.dictionary import Dictionary, post_process


def _make_dict():
    d = Dictionary()
    for w in ["hello", "world", "▁foo", "▁bar"]:
        d.add_symbol(w)
    return d


def test_special_symbols():
    d = Dictionary()
    assert d.bos() == 0 and d.pad() == 1 and d.eos() == 2 and d.unk() == 3
    assert len(d) == 4
    assert d[0] == "<s>" and d[1] == "<pad>" and d[2] == "</s>" and d[3] == "<unk>"


def test_encode_decode_roundtrip():
    d = _make_dict()
    ids = d.encode_line("hello world")
    assert ids.dtype == np.int32
    assert ids[-1] == d.eos()
    assert d.string(ids) == "hello world"


def test_unk_handling():
    d = _make_dict()
    ids = d.encode_line("hello unknownword", append_eos=False)
    assert ids[1] == d.unk()
    assert d.string(ids) == "hello <unk>"
    assert d.string(ids, escape_unk=True) == "hello <<unk>>"


def test_load_save_roundtrip(tmp_path):
    d = _make_dict()
    p = str(tmp_path / "dict.txt")
    d.save(p)
    d2 = Dictionary.load(p)
    assert d == d2


def test_load_from_file_object():
    f = io.StringIO("alpha 10\nbeta 5\n")
    d = Dictionary()
    d.add_from_file(f)
    assert d.index("alpha") == 4 and d.index("beta") == 5


def test_sentencepiece_post_process():
    d = _make_dict()
    ids = d.encode_line("▁foo ▁bar", append_eos=False)
    assert d.string(ids, bpe_symbol="sentencepiece") == "foo bar"
    assert post_process("he@@ llo wor@@ ld", "@@ ") == "hello world"


def test_finalize_and_pad():
    d = Dictionary()
    d.add_symbol("a", n=5)
    d.add_symbol("b", n=10)
    d.finalize(padding_factor=8)
    assert len(d) % 8 == 0
    # most frequent first
    assert d.index("b") < d.index("a")
