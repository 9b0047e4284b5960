"""Multilingual transformer + task (VERDICT r1 missing #5; reference:
fairseq/models/multilingual_transformer.py,
fairseq/tasks/multilingual_translation.py)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_st_tpu.models import build_model_from_arch

TINY = {
    "src_vocab_size": 20, "tgt_vocab_size": 20,
    "encoder_embed_dim": 16, "encoder_ffn_dim": 32,
    "encoder_layers": 1, "encoder_heads": 2,
    "decoder_embed_dim": 16, "decoder_ffn_dim": 32,
    "decoder_layers": 1, "decoder_heads": 2,
}


def _params_and_data(model):
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(4, 20, size=(2, 6)), jnp.int32)
    prev = jnp.asarray(rng.integers(4, 20, size=(2, 4)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src, prev,
                        method=type(model).init_everything)
    return params, src, prev


def _param_names(params):
    return {
        "/".join(str(getattr(k, "key", k)) for k in p)
        for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]
    }


def test_shared_by_language_sides():
    # de-en and de-fr share the de encoder; de-en and fr-en share the en decoder
    model = build_model_from_arch("multilingual_transformer", {
        **TINY, "lang_pairs": "de-en,de-fr,fr-en",
    })
    params, src, prev = _params_and_data(model)
    names = _param_names(params)
    assert any(n.startswith("params/enc_de/") for n in names)
    assert any(n.startswith("params/enc_fr/") for n in names)
    assert any(n.startswith("params/dec_en/") for n in names)
    assert any(n.startswith("params/dec_fr/") for n in names)
    # exactly 2 encoders + 2 decoders (no per-pair duplication)
    encs = {n.split("/")[1] for n in names if n.startswith("params/enc_")}
    decs = {n.split("/")[1] for n in names if n.startswith("params/dec_")}
    assert encs == {"enc_de", "enc_fr"} and decs == {"dec_en", "dec_fr"}

    out1 = model.apply(params, src, prev, pair="de-en")
    out2 = model.apply(params, src, prev, pair="de-fr")
    assert out1.shape == (2, 4, 20)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_share_encoders_flag():
    model = build_model_from_arch("multilingual_transformer", {
        **TINY, "lang_pairs": "de-en,fr-en", "share_encoders": True,
    })
    params, src, prev = _params_and_data(model)
    names = _param_names(params)
    encs = {n.split("/")[1] for n in names if n.startswith("params/enc_")}
    assert encs == {"enc_shared"}
    o1 = model.apply(params, src, prev, pair="de-en")
    o2 = model.apply(params, src, prev, pair="fr-en")
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


@pytest.mark.slow
def test_group_pure_batches_cover_every_sample(tmp_path):
    """Pair-pure batching must come from the batch builder: with two pairs
    interleaved in size order, every index appears in exactly one batch and
    every batch is a single pair (review fix: mixed batches used to be
    trimmed to the majority pair, silently dropping the same minority rows
    every epoch)."""
    from chimera_st_tpu.cli import preprocess
    from chimera_st_tpu.tasks import setup_task
    from tests.synthetic_data import make_parallel_text

    raw = make_parallel_text(str(tmp_path / "raw"))
    bin_dir = str(tmp_path / "bin")
    preprocess.main([
        "-s", "de", "-t", "en",
        "--trainpref", f"{raw}/train", "--validpref", f"{raw}/valid",
        "--destdir", bin_dir, "--joined-dictionary",
    ])
    import shutil

    for split in ("train", "valid"):
        for ext in ("bin", "idx"):
            shutil.copy(Path(bin_dir) / f"{split}.de-en.de.{ext}",
                        Path(bin_dir) / f"{split}.en-de.en.{ext}")
            shutil.copy(Path(bin_dir) / f"{split}.de-en.en.{ext}",
                        Path(bin_dir) / f"{split}.en-de.de.{ext}")
    task = setup_task({"_name": "multilingual_translation", "data": bin_dir,
                       "lang_pairs": "de-en,en-de"})
    task.load_dataset("train")
    ds = task.dataset("train")
    itr = task.make_batch_iterator(ds, max_sentences=4, seed=1,
                                   num_length_buckets=2)
    per_pair = {}
    for batch in itr.next_epoch_itr(shuffle=False):
        n = int(np.asarray(batch["target"]).shape[0])
        per_pair[batch["task_name"]] = per_pair.get(batch["task_name"], 0) + n
    # every sample of BOTH pairs reaches a batch (each pair holds half the
    # concat dataset here); collate_indices raises on any mixed batch
    assert per_pair == {"de-en": len(ds) // 2, "en-de": len(ds) // 2}, per_pair


def test_multilingual_task_e2e(tmp_path):
    from chimera_st_tpu.cli import preprocess, train
    from tests.synthetic_data import make_parallel_text

    raw = make_parallel_text(str(tmp_path / "raw"))
    bin_dir = str(tmp_path / "bin")
    preprocess.main([
        "-s", "de", "-t", "en",
        "--trainpref", f"{raw}/train", "--validpref", f"{raw}/valid",
        "--destdir", bin_dir, "--joined-dictionary",
    ])
    # second pair en-de reuses the same binarized files, reversed naming
    import shutil

    for split in ("train", "valid"):
        for ext in ("bin", "idx"):
            shutil.copy(Path(bin_dir) / f"{split}.de-en.de.{ext}",
                        Path(bin_dir) / f"{split}.en-de.en.{ext}")
            shutil.copy(Path(bin_dir) / f"{split}.de-en.en.{ext}",
                        Path(bin_dir) / f"{split}.en-de.de.{ext}")

    save_dir = str(tmp_path / "ckpt")
    train.main([
        bin_dir, "--task", "multilingual_translation",
        "--lang-pairs", "de-en,en-de",
        "--arch", "multilingual_transformer_iwslt_de_en",
        "--encoder-embed-dim", "16", "--encoder-ffn-dim", "32",
        "--encoder-layers", "1", "--encoder-heads", "2",
        "--decoder-embed-dim", "16", "--decoder-ffn-dim", "32",
        "--decoder-layers", "1", "--decoder-heads", "2",
        "--criterion", "multilingual_label_smoothed_cross_entropy",
        "--label-smoothing", "0.1",
        "--optimizer", "adam", "--lr", "1e-3", "--lr-scheduler", "inverse_sqrt",
        "--warmup-updates", "2", "--batch-size", "8", "--max-update", "3",
        "--save-dir", save_dir, "--dtype", "float32",
        "--disable-validation", "--num-length-buckets", "2",
    ])
    assert (Path(save_dir) / "checkpoint_last.ckpt").is_file()
