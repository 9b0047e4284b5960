"""Character-aware token embeddings (reference:
fairseq/modules/character_token_embedder.py + transformer_lm
--character-embeddings)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_st_tpu.data.dictionary import Dictionary
from chimera_st_tpu.models.character_embedder import (
    CharacterTokenEmbedder,
    build_word_to_char,
)


def _dict(words):
    d = Dictionary()
    for w in words:
        d.add_symbol(w)
    return d


def test_word_to_char_table():
    d = _dict(["cat", "cats", "Ü"])
    t = build_word_to_char(d, max_char_len=6)
    assert t.shape == (len(d), 6)
    # specials spell as all-pad
    assert (t[: d.nspecial] == 0).all()
    i = d.index("cat")
    assert list(t[i][:4]) == [ord("c") + 1, ord("a") + 1, ord("t") + 1, 0]
    # multi-byte utf-8 char -> two byte slots
    j = d.index("Ü")
    assert (t[j][:2] > 0).all() and t[j][2] == 0
    # truncation
    d2 = _dict(["abcdefgh"])
    t2 = build_word_to_char(d2, max_char_len=4)
    assert (t2[d2.index("abcdefgh")] > 0).all()


def test_embedder_semantics():
    d = _dict(["cat", "dog", "cats"])
    table = build_word_to_char(d, max_char_len=8)
    emb = CharacterTokenEmbedder(
        word_to_char=table, word_embed_dim=16, char_embed_dim=4,
        filters=((1, 8), (2, 12)), highway_layers=1,
        pad_idx=d.pad(), eos_idx=d.eos(), unk_idx=d.unk(),
    )
    toks = jnp.asarray(
        [[d.index("cat"), d.index("dog"), d.eos(), d.pad()],
         [d.index("cats"), d.unk(), d.index("cat"), d.pad()]], jnp.int32,
    )
    params = emb.init(jax.random.PRNGKey(0), toks)
    out = np.asarray(emb.apply(params, toks))
    assert out.shape == (2, 4, 16)
    # pad embeds to exactly zero
    np.testing.assert_array_equal(out[0, 3], np.zeros(16))
    # eos/unk hit the dedicated symbol vectors
    sym = np.asarray(params["params"]["symbol_embeddings"])
    np.testing.assert_allclose(out[0, 2], sym[0], rtol=1e-5)
    np.testing.assert_allclose(out[1, 1], sym[1], rtol=1e-5)
    # same word -> same embedding wherever it appears
    np.testing.assert_allclose(out[0, 0], out[1, 2], rtol=1e-5)
    # morphologically close words share character n-grams but differ
    assert np.abs(out[0, 0] - out[1, 0]).max() > 1e-6


def test_transformer_lm_char_embeddings_e2e(tmp_path):
    """--character-embeddings through the real train CLI: builds, trains,
    persists a restorable config (the spelling table is re-injected from
    the dictionary at restore, never stored)."""
    from chimera_st_tpu.cli import train

    save = str(tmp_path / "ckpt")
    train.main([
        "dummy", "--task", "dummy_lm",
        "--dict-size", "32", "--tokens-per-sample", "12",
        "--dataset-size", "16",
        "--arch", "transformer_lm", "--character-embeddings",
        "--character-embedding-dim", "4",
        "--character-filters", "((1,8),(2,12))",
        "--char-embedder-highway-layers", "1",
        "--embed-dim", "32", "--ffn-dim", "64", "--layers", "1",
        "--heads", "2",
        "--criterion", "cross_entropy", "--optimizer", "adam",
        "--lr", "1e-3", "--lr-scheduler", "fixed", "--batch-size", "4",
        "--max-update", "2", "--save-dir", save, "--dtype", "float32",
        "--disable-validation", "--num-length-buckets", "1",
    ])
    import pathlib

    assert (pathlib.Path(save) / "checkpoint_last.ckpt").is_file()
