"""sentence_prediction / sentence_ranking tasks driving the BART
classification head end-to-end (reference: tasks/sentence_prediction.py,
tasks/sentence_ranking.py, criterions/sentence_ranking.py)."""

from pathlib import Path

import numpy as np
import pytest

EOS = 2


def _write_binarized(prefix: Path, rows):
    from chimera_st_tpu.data.indexed_dataset import MMapIndexedDatasetBuilder

    prefix.parent.mkdir(parents=True, exist_ok=True)
    b = MMapIndexedDatasetBuilder(str(prefix))
    for r in rows:
        b.add_item(np.asarray(r, np.int64))
    b.finalize()


def _make_cls_data(root: Path, n=12, with_input1=True):
    from chimera_st_tpu.data.dictionary import Dictionary

    d = Dictionary()
    for w in "a b c d e f g h".split():
        d.add_symbol(w)
    (root / "input0").mkdir(parents=True)
    d.save(str(root / "input0" / "dict.txt"))
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, size=n)
    for split in ("train", "valid"):
        rows0 = [
            np.concatenate([rng.integers(4, 12, size=rng.integers(3, 8)), [EOS]])
            for _ in range(n)
        ]
        _write_binarized(root / "input0" / split, rows0)
        if with_input1:
            rows1 = [
                np.concatenate([rng.integers(4, 12, size=rng.integers(3, 6)), [EOS]])
                for _ in range(n)
            ]
            _write_binarized(root / "input1" / split, rows1)
        (root / "label").mkdir(exist_ok=True)
        (root / "label" / f"{split}.label").write_text(
            "\n".join(("yes" if l else "no") for l in labels) + "\n"
        )
    return root


def _make_rank_data(root: Path, n=10, num_cand=3):
    from chimera_st_tpu.data.dictionary import Dictionary

    d = Dictionary()
    for w in "a b c d e f g h".split():
        d.add_symbol(w)
    (root / "input0").mkdir(parents=True)
    d.save(str(root / "input0" / "dict.txt"))
    rng = np.random.default_rng(1)
    for split in ("train", "valid"):
        _write_binarized(root / "input0" / split, [
            np.concatenate([rng.integers(4, 12, size=4), [EOS]]) for _ in range(n)
        ])
        for c in range(1, num_cand + 1):
            _write_binarized(root / f"input{c}" / split, [
                np.concatenate([rng.integers(4, 12, size=rng.integers(2, 5)), [EOS]])
                for _ in range(n)
            ])
        (root / "label").mkdir(exist_ok=True)
        (root / "label" / f"{split}.label").write_text(
            "\n".join(str(int(x)) for x in rng.integers(0, num_cand, size=n)) + "\n"
        )
    return root


TINY_BART = [
    "--encoder-embed-dim", "16", "--encoder-ffn-dim", "32",
    "--encoder-layers", "1", "--decoder-layers", "1",
    "--encoder-heads", "2", "--decoder-heads", "2",
]


def test_sentence_prediction_dataset_and_criterion(tmp_path):
    import jax

    import chimera_st_tpu.criterions  # noqa: F401
    from chimera_st_tpu.config.registry import CRITERIONS
    from chimera_st_tpu.tasks import setup_task

    root = _make_cls_data(tmp_path)
    task = setup_task({"_name": "sentence_prediction", "data": str(root)})
    assert task.num_classes == 2
    task.load_dataset("train")
    ds = task.dataset("train")
    item = ds[0]
    assert item["tokens"][0] == 0 and item["tokens"][-1] == EOS
    batch = task.collate_indices(ds, np.arange(4), None)
    assert batch["src_tokens"].shape[0] == 4

    model = task.build_model({"arch": "bart_base", **{
        k.lstrip("-").replace("-", "_"): int(v)
        for k, v in zip(TINY_BART[::2], TINY_BART[1::2])
    }})
    from chimera_st_tpu.models.bart import BARTModel

    assert model.cfg.num_classes == 2
    import jax.numpy as jnp

    dev = {k: jnp.asarray(v) for k, v in batch.items() if k != "id"}
    params = model.init(
        jax.random.PRNGKey(0), dev["src_tokens"], dev["prev_output_tokens"],
        method=BARTModel.init_everything,
    )
    crit = CRITERIONS.get("sentence_prediction")({})
    loss, ss, logging = crit(model, params, dev, train=False)
    assert np.isfinite(float(loss)) and float(ss) == 4
    assert 0 <= float(logging["ncorrect"]) <= 4


def test_sentence_ranking_criterion(tmp_path):
    import jax
    import jax.numpy as jnp

    import chimera_st_tpu.criterions  # noqa: F401
    from chimera_st_tpu.config.registry import CRITERIONS
    from chimera_st_tpu.models.bart import BARTModel
    from chimera_st_tpu.tasks import setup_task

    root = _make_rank_data(tmp_path)
    task = setup_task({"_name": "sentence_ranking", "data": str(root),
                       "num_candidates": 3})
    task.load_dataset("train")
    ds = task.dataset("train")
    batch = task.collate_indices(ds, np.arange(4), None)
    assert batch["candidate_tokens"].shape[:2] == (4, 3)

    model = task.build_model({"arch": "bart_base", **{
        k.lstrip("-").replace("-", "_"): int(v)
        for k, v in zip(TINY_BART[::2], TINY_BART[1::2])
    }})
    assert model.cfg.num_classes == 1
    dev = {k: jnp.asarray(v) for k, v in batch.items() if k != "id"}
    t0 = dev["candidate_tokens"][:, 0]
    params = model.init(
        jax.random.PRNGKey(0), t0, t0, method=BARTModel.init_everything
    )
    crit = CRITERIONS.get("sentence_ranking")({})
    loss, ss, logging = crit(model, params, dev, train=False)
    assert np.isfinite(float(loss)) and float(ss) == 4
    g = jax.grad(lambda p: crit(model, p, dev, train=False)[0])(params)
    assert all(
        np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g)
    )


@pytest.mark.slow
def test_sentence_prediction_train_e2e(tmp_path):
    from chimera_st_tpu.cli import train

    root = _make_cls_data(tmp_path / "data")
    save = tmp_path / "ckpt"
    train.main([
        str(root), "--task", "sentence_prediction", "--arch", "bart_base",
        *TINY_BART,
        "--criterion", "sentence_prediction",
        "--optimizer", "adam", "--lr", "1e-3", "--lr-scheduler", "fixed",
        "--batch-size", "4", "--max-update", "3",
        "--save-dir", str(save), "--dtype", "float32",
        "--num-length-buckets", "2", "--disable-validation",
    ])
    assert (save / "checkpoint_last.ckpt").is_file()


@pytest.mark.slow
def test_sentence_ranking_train_e2e(tmp_path):
    from chimera_st_tpu.cli import train

    root = _make_rank_data(tmp_path / "data")
    save = tmp_path / "ckpt"
    train.main([
        str(root), "--task", "sentence_ranking", "--arch", "bart_base",
        *TINY_BART, "--num-candidates", "3",
        "--criterion", "sentence_ranking",
        "--optimizer", "adam", "--lr", "1e-3", "--lr-scheduler", "fixed",
        "--batch-size", "4", "--max-update", "2",
        "--save-dir", str(save), "--dtype", "float32",
        "--num-length-buckets", "2", "--disable-validation",
    ])
    assert (save / "checkpoint_last.ckpt").is_file()
