"""CLI-reachable CMLM / vanilla-NAT training (reference: translation_lev's
--noise random_mask/full_mask + criterion nat_loss). Review fix: nat_loss
consumed batch['masked_target'] that no task produced, so CMLM training was
unreachable outside unit tests."""

from pathlib import Path

import numpy as np
import pytest


def _mk_task(tmp_path, noise):
    from chimera_st_tpu.cli import preprocess
    from chimera_st_tpu.tasks import setup_task
    from tests.synthetic_data import make_parallel_text

    raw = make_parallel_text(str(tmp_path / f"raw_{noise}"))
    bin_dir = str(tmp_path / f"bin_{noise}")
    preprocess.main([
        "-s", "de", "-t", "en",
        "--trainpref", f"{raw}/train", "--validpref", f"{raw}/valid",
        "--destdir", bin_dir, "--joined-dictionary",
    ])
    task = setup_task({
        "_name": "translation_lev", "data": bin_dir,
        "source_lang": "de", "target_lang": "en", "noise": noise,
    })
    task.load_dataset("train")
    return task, bin_dir


@pytest.mark.quick
def test_random_mask_emits_cmlm_keys_and_rerolls_per_epoch(tmp_path):
    task, _ = _mk_task(tmp_path, "random_mask")
    ds = task.dataset("train")
    idx = np.arange(8)
    b1 = task.collate_indices(ds, idx, target_len=None, epoch=1)
    assert "masked_target" in b1 and "target_lengths" in b1
    masked = b1["masked_target"]
    tgt = np.asarray(b1["target"])
    pad, eos, unk = task.tgt_dict.pad(), task.tgt_dict.eos(), task.UNK
    # masked positions carry the mask token; everything else is the target
    changed = masked != tgt
    assert changed.any(), "random_mask masked nothing"
    assert (masked[changed] == unk).all()
    assert ((masked == tgt) | (masked == unk)).all()
    # eos and pads never masked
    assert (masked[tgt == eos] == eos).all()
    assert (masked[tgt == pad] == pad).all()
    assert (b1["target_lengths"] == (tgt != pad).sum(1)).all()
    # noise re-rolls per epoch but is deterministic per (epoch, id)
    b2 = task.collate_indices(ds, idx, target_len=None, epoch=2)
    b1b = task.collate_indices(ds, idx, target_len=None, epoch=1)
    assert (np.asarray(b1["masked_target"]) ==
            np.asarray(b1b["masked_target"])).all()
    assert (np.asarray(b1["masked_target"]) !=
            np.asarray(b2["masked_target"])).any()


@pytest.mark.quick
def test_full_mask_masks_everything_but_specials(tmp_path):
    task, _ = _mk_task(tmp_path, "full_mask")
    ds = task.dataset("train")
    b = task.collate_indices(ds, np.arange(4), target_len=None)
    masked = np.asarray(b["masked_target"])
    tgt = np.asarray(b["target"])
    pad, eos, unk = task.tgt_dict.pad(), task.tgt_dict.eos(), task.UNK
    interior = (tgt != pad) & (tgt != eos)
    assert (masked[interior] == unk).all()
    assert (masked[~interior] == tgt[~interior]).all()


@pytest.mark.slow
def test_cmlm_trains_from_cli(tmp_path):
    """chimera-train --task translation_lev --noise random_mask --arch
    cmlm_transformer --criterion nat_loss learns end to end, and the
    checkpoint decodes through chimera-generate's mask-predict path."""
    from chimera_st_tpu.cli import generate, preprocess, train
    from tests.synthetic_data import make_parallel_text

    raw = make_parallel_text(str(tmp_path / "raw"))
    bin_dir = str(tmp_path / "bin")
    preprocess.main([
        "-s", "de", "-t", "en",
        "--trainpref", f"{raw}/train", "--validpref", f"{raw}/valid",
        "--destdir", bin_dir, "--joined-dictionary",
    ])
    save_dir = str(tmp_path / "cmlm_ckpt")
    train.main([
        bin_dir, "--task", "translation_lev", "-s", "de", "-t", "en",
        "--noise", "random_mask",
        "--arch", "cmlm_transformer",
        "--encoder-embed-dim", "16", "--encoder-ffn-dim", "32",
        "--encoder-layers", "1", "--encoder-heads", "2",
        "--decoder-embed-dim", "16", "--decoder-ffn-dim", "32",
        "--decoder-layers", "1", "--decoder-heads", "2",
        "--max-predicted-length", "32",
        "--criterion", "nat_loss", "--label-smoothing", "0.1",
        "--optimizer", "adam", "--lr", "1e-3", "--lr-scheduler", "inverse_sqrt",
        "--warmup-updates", "2", "--batch-size", "8", "--max-update", "2",
        "--save-dir", save_dir, "--dtype", "float32",
        "--disable-validation", "--num-length-buckets", "2",
    ])
    out_dir = tmp_path / "gen"
    out_dir.mkdir()
    generate.main([
        bin_dir, "--task", "translation_lev", "-s", "de", "-t", "en",
        "--path", str(Path(save_dir) / "checkpoint_last.ckpt"),
        "--gen-subset", "valid", "--beam", "1", "--max-decode-len", "32",
        "--batch-size", "8", "--dtype", "float32",
        "--iter-decode-max-iter", "3",
        "--results-path", str(out_dir), "--num-length-buckets", "2",
    ])
    assert "H-" in (out_dir / "generate-valid.txt").read_text()
