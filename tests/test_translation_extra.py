"""translation_multi_simple_epoch / translation_from_pretrained_{bart,xlm} /
semisupervised_translation (reference: the corresponding fairseq tasks)."""

from pathlib import Path

import numpy as np
import pytest

EOS = 2


def _write_pair(root: Path, split: str, src: str, tgt: str, d, n=10, seed=0):
    from chimera_st_tpu.data.indexed_dataset import MMapIndexedDatasetBuilder

    rng = np.random.default_rng([seed, hash(split + src + tgt) % 1000])
    for lang in (src, tgt):
        b = MMapIndexedDatasetBuilder(str(root / f"{split}.{src}-{tgt}.{lang}"))
        for _ in range(n):
            b.add_item(np.concatenate(
                [rng.integers(4, len(d) - 1, size=rng.integers(3, 7)), [EOS]]
            ))
        b.finalize()


def _make_dict(root: Path, names=("dict.txt",)):
    from chimera_st_tpu.data.dictionary import Dictionary

    d = Dictionary()
    for w in "a b c d e f g h i j".split():
        d.add_symbol(w)
    for name in names:
        d.save(str(root / name))
    return d


def test_multi_simple_epoch_langtoks_and_sampling(tmp_path):
    from chimera_st_tpu.tasks import setup_task

    d = _make_dict(tmp_path)
    _write_pair(tmp_path, "train", "en", "de", d, n=20)
    _write_pair(tmp_path, "train", "en", "fr", d, n=5)
    task = setup_task({
        "_name": "translation_multi_simple_epoch", "data": str(tmp_path),
        "lang_pairs": "en-de,en-fr", "sampling_temperature": 2.0,
        "decoder_langtok": True,
    })
    task.load_dataset("train")
    ds = task.dataset("train")
    # temperature sampling upsamples the smaller pair: total > raw sum? The
    # ratios preserve the total (25) but shift mass toward en-fr
    assert len(ds) >= 24
    item = ds[0]
    # encoder langtok: first source token is the target-language token
    assert int(item["source"][0]) in task.lang_tag_indices()
    batch = task.collate_indices(ds, np.arange(4), None)
    # decoder langtok: prev starts with a language token, not eos
    assert int(batch["prev_output_tokens"][0, 0]) in task.lang_tag_indices()


def test_from_pretrained_bart_tags(tmp_path):
    from chimera_st_tpu.data.dictionary import Dictionary
    from chimera_st_tpu.tasks import setup_task

    d = _make_dict(tmp_path, names=("dict.en.txt", "dict.de.txt"))
    _write_pair(tmp_path, "train", "en", "de", d)
    task = setup_task({
        "_name": "translation_from_pretrained_bart", "data": str(tmp_path),
        "source_lang": "en", "target_lang": "de", "langs": "en,de",
    })
    task.load_dataset("train")
    ds = task.dataset("train")
    item = ds[0]
    # mBART: source ends with [src_lang] (after eos)
    assert int(item["source"][-1]) == task.src_dict.index("[en]")
    batch = task.collate_indices(ds, np.arange(3), None)
    assert int(batch["prev_output_tokens"][0, 0]) == task.tgt_dict.index("[de]")


def test_from_pretrained_xlm_merges_checkpoint(tmp_path):
    import pickle

    import jax
    import jax.numpy as jnp

    from chimera_st_tpu.models import build_model_from_arch
    from chimera_st_tpu.tasks import setup_task

    d = _make_dict(tmp_path, names=("dict.en.txt", "dict.de.txt"))
    _write_pair(tmp_path, "train", "en", "de", d)
    V = len(d)
    xlm = build_model_from_arch("roberta_base", {
        "vocab_size": V, "embed_dim": 16, "ffn_dim": 32, "layers": 1,
        "heads": 2,
    })
    t = jnp.full((1, 4), 2, jnp.int32)
    xlm_params = xlm.init(jax.random.PRNGKey(3), t)
    ckpt = tmp_path / "xlm.ckpt"
    with open(ckpt, "wb") as f:
        pickle.dump({"params": jax.tree_util.tree_map(np.asarray, xlm_params)}, f)

    task = setup_task({
        "_name": "translation_from_pretrained_xlm", "data": str(tmp_path),
        "source_lang": "en", "target_lang": "de",
        "pretrained_xlm_checkpoint": str(ckpt),
    })
    mt = task.build_model({
        "arch": "transformer_from_pretrained_xlm",
        "src_vocab_size": V, "tgt_vocab_size": V,
        "encoder_embed_dim": 16, "encoder_ffn_dim": 32,
        "encoder_layers": 1, "encoder_heads": 2,
        "decoder_embed_dim": 16, "decoder_ffn_dim": 32,
        "decoder_layers": 1, "decoder_heads": 2,
    })
    fresh = mt.init(jax.random.PRNGKey(4), t, t)
    merged = task.post_init_params(fresh, mt, object())
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["embed_tokens"]["embedding"]),
        np.asarray(xlm_params["params"]["embed_tokens"]["embedding"]),
    )


def test_semisupervised_mixes_dae(tmp_path):
    from chimera_st_tpu.tasks import setup_task

    d = _make_dict(tmp_path, names=("dict.en.txt", "dict.de.txt"))
    _write_pair(tmp_path, "train", "en", "de", d, n=12)
    task = setup_task({
        "_name": "semisupervised_translation", "data": str(tmp_path),
        "source_lang": "en", "target_lang": "de",
        "lambda_parallel": 1.0, "lambda_denoising": 1.0,
    })
    task.load_dataset("train")
    ds = task.dataset("train")
    assert len(ds) >= 20  # parallel + denoising parts
    batch = task.collate_indices(ds, np.arange(4), None)
    for k in ("src_tokens", "prev_output_tokens", "target"):
        assert k in batch
    # a denoising sample reconstructs the clean target from a noised source
    dae_item = ds[len(ds) - 1]
    assert dae_item["target"][-1] == EOS


def test_mixed_pair_batch_rows_get_own_lang_token(tmp_path):
    """Review fix: a batch mixing language pairs must stamp EACH row's own
    target-language token onto prev_output_tokens (samples[0]'s tag used to
    be broadcast to every row)."""
    from chimera_st_tpu.tasks import setup_task

    d = _make_dict(tmp_path)
    _write_pair(tmp_path, "train", "en", "de", d, n=6)
    _write_pair(tmp_path, "train", "en", "fr", d, n=6)
    task = setup_task({
        "_name": "translation_multi_simple_epoch", "data": str(tmp_path),
        "lang_pairs": "en-de,en-fr", "decoder_langtok": True,
    })
    task.load_dataset("train")
    ds = task.dataset("train")
    # pick indices straddling the two concatenated pair datasets
    idx = np.asarray([0, 1, len(ds) - 2, len(ds) - 1])
    samples = [ds[int(i)] for i in idx]
    tags = {int(s["_tgt_bos"]) for s in samples}
    assert len(tags) == 2  # really a mixed batch
    batch = task.collate_indices(ds, idx, None)
    assert set(batch["prev_output_tokens"][:, 0].tolist()) == tags


def test_sampling_alpha_direction(tmp_path):
    """sampling_alpha is the DIRECT exponent p^a (upsample small pairs for
    a<1); it used to be routed through the temperature formula p^(1/a)."""
    from chimera_st_tpu.tasks import setup_task

    d = _make_dict(tmp_path)
    _write_pair(tmp_path, "train", "en", "de", d, n=20)
    _write_pair(tmp_path, "train", "en", "fr", d, n=5)

    def small_pair_len(cfg_extra):
        task = setup_task({
            "_name": "translation_multi_simple_epoch", "data": str(tmp_path),
            "lang_pairs": "en-de,en-fr", **cfg_extra,
        })
        task.load_dataset("train")
        ds = task.dataset("train")
        # total resampled size is conserved; the en-fr (second) part's
        # resampled length reveals the smoothing direction
        return len(ds.parts[1])

    flattened = small_pair_len({"sampling_alpha": 0.25})   # p^0.25 upsamples
    sharpened = small_pair_len({"sampling_temperature": 0.25})  # p^4
    assert flattened > 5 >= sharpened  # raw en-fr size is 5


def test_mbart_target_suffix(tmp_path):
    """mBART format: the TARGET also ends with [tgt_lang] (review fix), and
    prev rotates it to the front."""
    from chimera_st_tpu.tasks import setup_task

    d = _make_dict(tmp_path, names=("dict.en.txt", "dict.de.txt"))
    _write_pair(tmp_path, "train", "en", "de", d)
    task = setup_task({
        "_name": "translation_from_pretrained_bart", "data": str(tmp_path),
        "source_lang": "en", "target_lang": "de", "langs": "en,de",
    })
    task.load_dataset("train")
    ds = task.dataset("train")
    item = ds[0]
    tag = task.tgt_dict.index("[de]")
    assert int(item["target"][-1]) == tag
    batch = task.collate_indices(ds, np.arange(2), None)
    assert (batch["prev_output_tokens"][:, 0] == tag).all()
    # target rows end with the tag (before padding)
    tgt = batch["target"]
    for row in tgt:
        nonpad = row[row != task.tgt_dict.pad()]
        assert int(nonpad[-1]) == tag
