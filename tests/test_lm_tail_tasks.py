"""cross_lingual_lm / multilingual_masked_lm / legacy_masked_lm /
simple_classification tasks (reference: the corresponding fairseq tasks +
criterions/legacy_masked_lm.py)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import chimera_st_tpu.criterions  # noqa: F401
import chimera_st_tpu.tasks  # noqa: F401
from chimera_st_tpu.config.registry import CRITERIONS, TASKS

EOS = 2


def _write_mono(prefix: Path, d, n=10, seed=0):
    from chimera_st_tpu.data.indexed_dataset import MMapIndexedDatasetBuilder

    prefix.parent.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    b = MMapIndexedDatasetBuilder(str(prefix))
    for _ in range(n):
        b.add_item(np.concatenate(
            [rng.integers(4, len(d) - 1, size=rng.integers(4, 9)), [EOS]]
        ))
    b.finalize()


def _make_dict(root: Path, name="dict.txt"):
    from chimera_st_tpu.data.dictionary import Dictionary

    d = Dictionary()
    for w in "a b c d e f g h".split():
        d.add_symbol(w)
    root.mkdir(parents=True, exist_ok=True)
    d.save(str(root / name))
    return d


def test_cross_lingual_lm_langs_and_batches(tmp_path):
    from chimera_st_tpu.tasks import setup_task

    d = _make_dict(tmp_path)
    for lang, n in (("en", 16), ("de", 4)):
        _write_mono(tmp_path / lang / "train", d, n=n, seed=hash(lang) % 100)
    for name in ("cross_lingual_lm", "multilingual_masked_lm"):
        task = setup_task({"_name": name, "data": str(tmp_path),
                           "tokens_per_sample": 16,
                           "multilang_sampling_alpha": 0.5})
        assert task.langs == ["de", "en"]
        task.load_dataset("train")
        ds = task.dataset("train")
        batch = task.collate_indices(ds, np.arange(4), None)
        assert "lang_ids" in batch and batch["net_tokens"].shape[0] == 4
        # masked positions carry the original token in target
        assert (batch["target"] != 1).any()


def test_legacy_masked_lm_task_and_criterion(tmp_path):
    from chimera_st_tpu.models import build_model_from_arch
    from chimera_st_tpu.tasks import setup_task

    d = _make_dict(tmp_path)
    _write_mono(tmp_path / "train", d, n=12)
    task = setup_task({"_name": "legacy_masked_lm", "data": str(tmp_path)})
    task.load_dataset("train")
    ds = task.dataset("train")
    item = ds[0]
    assert item["net_tokens"][0] == 0  # bos
    assert (item["segments"] == 1).any() and (item["segments"] == 0).any()
    assert item["sentence_target"] in (0, 1)

    batch = task.collate_indices(ds, np.arange(4), None)
    model = build_model_from_arch("roberta_base", {
        "vocab_size": len(task.dictionary), "embed_dim": 16, "ffn_dim": 32,
        "layers": 1, "heads": 2, "sentence_class_num": 2, "dropout": 0.0,
    })
    dev = {k: jnp.asarray(v) for k, v in batch.items() if k != "id"}
    params = model.init(jax.random.PRNGKey(0), dev["net_tokens"])
    assert "sentence_projection" in params["params"]
    crit = CRITERIONS.get("legacy_masked_lm")({"padding_idx": 1})
    loss, ss, logging = crit(model, params, dev, train=False)
    assert np.isfinite(float(loss))
    assert float(logging["nsp_loss"]) > 0  # NSP head engaged
    g = jax.grad(lambda p: crit(model, p, dev, train=False)[0])(params)
    gn = float(jnp.linalg.norm(
        g["params"]["sentence_projection"]["kernel"].astype(jnp.float32)
    ))
    assert gn > 0


def test_simple_classification_e2e(tmp_path):
    from chimera_st_tpu.data.dictionary import Dictionary
    from chimera_st_tpu.models import build_model_from_arch
    from chimera_st_tpu.tasks import setup_task

    din = Dictionary()
    for w in "x y z w".split():
        din.add_symbol(w)
    din.save(str(tmp_path / "dict.input.txt"))
    dlab = Dictionary()
    for w in ("pos", "neg"):
        dlab.add_symbol(w)
    dlab.save(str(tmp_path / "dict.label.txt"))
    rng = np.random.default_rng(0)
    lines, labels = [], []
    for _ in range(12):
        ws = rng.choice(["x", "y", "z", "w"], size=rng.integers(2, 5))
        lines.append(" ".join(ws))
        labels.append("pos" if ws[0] in ("x", "y") else "neg")
    for split in ("train", "valid"):
        (tmp_path / f"{split}.input").write_text("\n".join(lines) + "\n")
        (tmp_path / f"{split}.label").write_text("\n".join(labels) + "\n")

    task = setup_task({"_name": "simple_classification", "data": str(tmp_path)})
    task.load_dataset("train")
    ds = task.dataset("train")
    batch = task.collate_indices(ds, np.arange(4), None)
    model = task.build_model({"arch": "rnn_classifier",
                              "embed_dim": 16, "hidden_size": 16})
    assert model.cfg.num_classes == len(dlab)
    dev = {k: jnp.asarray(v) for k, v in batch.items() if k != "id"}
    params = model.init(jax.random.PRNGKey(0), dev["net_tokens"])
    crit = CRITERIONS.get("simple_classification")({})
    loss, ss, logging = crit(model, params, dev, train=False)
    assert np.isfinite(float(loss)) and float(ss) == 4


def test_tail_tasks_registered():
    for name in ("cross_lingual_lm", "multilingual_masked_lm",
                 "legacy_masked_lm", "simple_classification",
                 "translation_multi_simple_epoch",
                 "translation_from_pretrained_bart",
                 "translation_from_pretrained_xlm",
                 "semisupervised_translation", "denoising",
                 "multilingual_denoising", "sentence_prediction",
                 "sentence_ranking"):
        assert name in TASKS, name
