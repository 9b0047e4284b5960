"""Levenshtein NAT: edit-ops targets, jittable edit operators, tiny-data
train + refine decode (VERDICT r1 item 8; reference:
fairseq/models/nat/levenshtein_transformer.py, clib/libnat/edit_dist.cpp)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_st_tpu.clib import _suggested_edit_ops_py, suggested_edit_ops
from chimera_st_tpu.models.nat_levenshtein import (
    LevenshteinConfig,
    LevenshteinTransformer,
    apply_del_words,
    apply_ins_placeholders,
)

PAD, BOS, EOS, UNK = 1, 0, 2, 3


def test_edit_ops_insertion_targets():
    # x = [bos, a, b, eos]; y = [bos, a, c, b, d, eos]
    xs = np.array([[BOS, 10, 11, EOS, PAD, PAD]], np.int32)
    ys = np.array([[BOS, 10, 12, 11, 13, EOS]], np.int32)
    ic, im, dl = suggested_edit_ops(xs, ys, PAD)
    np.testing.assert_array_equal(ic[0][:3], [0, 1, 1])  # c after a, d after b
    np.testing.assert_array_equal(im[0].astype(int), [0, 0, 1, 0, 1, 0])
    assert not dl.any()


def test_edit_ops_deletion_targets():
    # x = [bos, a, b, c, eos]; y = [bos, b, eos] -> delete a and c
    xs = np.array([[BOS, 10, 11, 12, EOS]], np.int32)
    ys = np.array([[BOS, 11, EOS, PAD, PAD]], np.int32)
    _, _, dl = suggested_edit_ops(xs, ys, PAD)
    np.testing.assert_array_equal(dl[0].astype(int), [0, 1, 0, 1, 0])


def test_edit_ops_native_matches_python_fallback(rng):
    for _ in range(20):
        lx = int(rng.integers(2, 12))
        ly = int(rng.integers(2, 14))
        x = np.concatenate([[BOS], rng.integers(4, 20, lx), [EOS]])
        y = np.concatenate([[BOS], rng.integers(4, 20, ly), [EOS]])
        xs = np.full((1, 16), PAD, np.int32)
        ys = np.full((1, 18), PAD, np.int32)
        xs[0, : len(x)] = x
        ys[0, : len(y)] = y
        a = suggested_edit_ops(xs, ys, PAD)
        b = _suggested_edit_ops_py(xs, ys, PAD)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1].astype(bool))
        np.testing.assert_array_equal(a[2], b[2].astype(bool))


def test_apply_del_words_compacts():
    toks = jnp.asarray([[BOS, 10, 11, 12, EOS, PAD]], jnp.int32)
    pred = jnp.asarray([[True, True, False, True, True, False]])
    out = apply_del_words(toks, pred, PAD, BOS, EOS)
    np.testing.assert_array_equal(
        np.asarray(out)[0], [BOS, 11, EOS, PAD, PAD, PAD]
    )  # bos/eos protected, pads stay pad


def test_apply_ins_placeholders_inserts_and_caps():
    toks = jnp.asarray([[BOS, 10, EOS, PAD, PAD, PAD]], jnp.int32)
    ins = jnp.asarray([[2, 1, 0, 0, 0]], jnp.int32)  # 2 after bos, 1 after 10
    out = apply_ins_placeholders(toks, ins, PAD, UNK, EOS)
    np.testing.assert_array_equal(
        np.asarray(out)[0], [BOS, UNK, UNK, 10, UNK, EOS]
    )
    # cap: requesting more than fits the buffer must clip, keeping all inputs
    ins = jnp.asarray([[5, 5, 0, 0, 0]], jnp.int32)
    out = np.asarray(apply_ins_placeholders(toks, ins, PAD, UNK, EOS))[0]
    assert (out != PAD).sum() == 6 and out[0] == BOS and EOS in out


def test_edit_round_trip():
    """del + placeholder-ins + fill reconstructs the target from a corrupt
    input when fed oracle labels."""
    y = np.array([BOS, 5, 6, 7, 8, EOS], np.int32)
    corrupt = np.array([[BOS, 5, 99, 7, EOS, PAD, PAD, PAD]], np.int32)
    ytgt = np.full((1, 8), PAD, np.int32)
    ytgt[0, : len(y)] = y
    # oracle del: remove 99
    _, _, dl = suggested_edit_ops(corrupt, ytgt, PAD)
    t = apply_del_words(jnp.asarray(corrupt), jnp.asarray(dl), PAD, BOS, EOS)
    # oracle ins on the deleted version
    ic, im, _ = suggested_edit_ops(np.asarray(t), ytgt, PAD)
    t = apply_ins_placeholders(t, jnp.asarray(ic), PAD, UNK, EOS)
    # fill placeholders with the target tokens at those positions
    filled = np.array(t)[0]  # writable copy
    expect_mask = filled == UNK
    filled[expect_mask] = ytgt[0][np.asarray(im)[0]]
    np.testing.assert_array_equal(filled[: len(y)], y)


@pytest.mark.slow
def test_levenshtein_train_and_decode_cli(tmp_path):
    from chimera_st_tpu.cli import generate, train
    from tests.synthetic_data import make_parallel_text

    raw = make_parallel_text(str(tmp_path / "raw"))
    bin_dir = str(tmp_path / "bin")
    from chimera_st_tpu.cli import preprocess

    preprocess.main([
        "-s", "de", "-t", "en",
        "--trainpref", f"{raw}/train", "--validpref", f"{raw}/valid",
        "--destdir", bin_dir, "--joined-dictionary",
    ])
    save_dir = str(tmp_path / "lev_ckpt")
    train.main([
        bin_dir, "--task", "translation_lev", "-s", "de", "-t", "en",
        "--arch", "levenshtein_transformer",
        "--encoder-embed-dim", "16", "--encoder-ffn-dim", "32",
        "--encoder-layers", "1", "--encoder-heads", "2",
        "--decoder-embed-dim", "16", "--decoder-ffn-dim", "32",
        "--decoder-layers", "1", "--decoder-heads", "2",
        "--max-ins", "8",
        "--criterion", "levenshtein_loss", "--label-smoothing", "0.1",
        "--optimizer", "adam", "--lr", "1e-3", "--lr-scheduler", "inverse_sqrt",
        "--warmup-updates", "2", "--batch-size", "8", "--max-update", "3",
        "--save-dir", save_dir, "--dtype", "float32",
        "--disable-validation", "--num-length-buckets", "2",
    ])
    assert (Path(save_dir) / "checkpoint_last.ckpt").is_file()

    out_dir = tmp_path / "gen"
    out_dir.mkdir()
    generate.main([
        bin_dir, "--task", "translation_lev", "-s", "de", "-t", "en",
        "--path", str(Path(save_dir) / "checkpoint_last.ckpt"),
        "--gen-subset", "valid", "--beam", "1", "--max-decode-len", "32",
        "--batch-size", "8", "--dtype", "float32",
        "--results-path", str(out_dir), "--num-length-buckets", "2",
    ])
    text = (out_dir / "generate-valid.txt").read_text()
    assert "H-" in text
