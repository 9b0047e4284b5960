"""Insertion transformer NAT (reference:
fairseq/models/nat/insertion_transformer.py)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_st_tpu.models import build_model_from_arch
from chimera_st_tpu.models.nat_insertion import insertion_slot_targets

PAD, BOS, EOS, UNK = 1, 0, 2, 3

TINY = {
    "src_vocab_size": 20, "tgt_vocab_size": 20,
    "encoder_embed_dim": 16, "encoder_ffn_dim": 32,
    "encoder_layers": 1, "encoder_heads": 2,
    "decoder_embed_dim": 16, "decoder_ffn_dim": 32,
    "decoder_layers": 1, "decoder_heads": 2,
}


def test_slot_targets_tree_weights():
    from chimera_st_tpu.clib import suggested_edit_ops

    # x = [bos, eos]; y = [bos, 5, 6, 7, eos] -> slot 0 inserts 5,6,7
    xs = np.array([[BOS, EOS, PAD, PAD]], np.int32)
    ys = np.array([[BOS, 5, 6, 7, EOS]], np.int32)
    ic, im, _ = suggested_edit_ops(xs, ys, PAD)
    toks, wts = insertion_slot_targets(xs, ys, ic, im, pad=PAD, max_span=4, tau=1.0)
    np.testing.assert_array_equal(toks[0, 0, :3], [5, 6, 7])
    # balanced-tree: the CENTER token (6) gets the largest weight
    assert wts[0, 0, 1] > wts[0, 0, 0]
    assert wts[0, 0, 1] > wts[0, 0, 2]
    np.testing.assert_allclose(wts[0, 0].sum(), 1.0, atol=1e-5)
    # slot after eos-anchored position is empty -> pad with weight 1
    assert toks[0, 1, 0] == PAD and wts[0, 1, 0] == 1.0


def test_insertion_model_forward_and_refine():
    rng = np.random.default_rng(0)
    model = build_model_from_arch("insertion_transformer", TINY)
    src = jnp.asarray(rng.integers(4, 20, size=(2, 6)), jnp.int32)
    slot_in = jnp.asarray(
        [[BOS, 5, EOS, PAD], [BOS, 7, EOS, PAD]], jnp.int32
    )
    params = model.init(jax.random.PRNGKey(0), src, slot_in)
    logits = model.apply(params, src, slot_in)
    assert logits.shape == (2, 3, 20)

    tokens, lengths = model.apply(
        params, src, iterations=3, max_len=12, method=type(model).refine
    )
    t = np.asarray(tokens)
    assert t.shape == (2, 12)
    assert (t[:, 0] == BOS).all()
    for b in range(2):
        L = int(np.asarray(lengths)[b])
        assert EOS in t[b, :L]


@pytest.mark.slow
def test_insertion_train_cli(tmp_path):
    from chimera_st_tpu.cli import preprocess, train
    from tests.synthetic_data import make_parallel_text

    raw = make_parallel_text(str(tmp_path / "raw"))
    bin_dir = str(tmp_path / "bin")
    preprocess.main([
        "-s", "de", "-t", "en",
        "--trainpref", f"{raw}/train", "--validpref", f"{raw}/valid",
        "--destdir", bin_dir, "--joined-dictionary",
    ])
    save_dir = str(tmp_path / "ins_ckpt")
    train.main([
        bin_dir, "--task", "translation_ins", "-s", "de", "-t", "en",
        "--arch", "insertion_transformer",
        "--encoder-embed-dim", "16", "--encoder-ffn-dim", "32",
        "--encoder-layers", "1", "--encoder-heads", "2",
        "--decoder-embed-dim", "16", "--decoder-ffn-dim", "32",
        "--decoder-layers", "1", "--decoder-heads", "2",
        "--criterion", "insertion_loss",
        "--optimizer", "adam", "--lr", "1e-3", "--lr-scheduler", "inverse_sqrt",
        "--warmup-updates", "2", "--batch-size", "8", "--max-update", "3",
        "--save-dir", save_dir, "--dtype", "float32",
        "--disable-validation", "--num-length-buckets", "2",
    ])
    assert (Path(save_dir) / "checkpoint_last.ckpt").is_file()
