import numpy as np
import pytest

from chimera_st_tpu.data.token_block_dataset import TokenBlockDataset


def _items(sizes, eos=2):
    rng = np.random.default_rng(0)
    return [
        np.concatenate([rng.integers(4, 20, size=s - 1), [eos]]).astype(np.int32)
        for s in sizes
    ]


def test_token_block_eos_mode():
    items = _items([5, 3, 7])
    ds = TokenBlockDataset(items, [5, 3, 7], block_size=100, break_mode="eos")
    assert len(ds) == 3
    np.testing.assert_array_equal(ds[1], items[1])


def test_token_block_none_mode_covers_stream():
    items = _items([5, 3, 7])
    ds = TokenBlockDataset(items, [5, 3, 7], block_size=4, break_mode="none")
    stream = np.concatenate(items)
    rebuilt = np.concatenate([ds[i] for i in range(len(ds))])
    np.testing.assert_array_equal(rebuilt, stream)
    assert all(ds.num_tokens(i) <= 4 for i in range(len(ds)))


def test_token_block_complete_mode():
    items = _items([5, 3, 7, 2])
    ds = TokenBlockDataset(items, [5, 3, 7, 2], block_size=9, break_mode="complete")
    # 5+3 <= 9 packed; 7+2 <= 9 packed
    assert len(ds) == 2
    assert ds.num_tokens(0) == 8 and ds.num_tokens(1) == 9


def test_lm_task_end_to_end(tmp_path):
    from chimera_st_tpu.data.dictionary import Dictionary
    from chimera_st_tpu.data.indexed_dataset import MMapIndexedDatasetBuilder
    from chimera_st_tpu.tasks import setup_task

    d = Dictionary()
    for w in "a b c d e".split():
        d.add_symbol(w)
    d.save(str(tmp_path / "dict.txt"))
    b = MMapIndexedDatasetBuilder(str(tmp_path / "train"))
    rng = np.random.default_rng(1)
    for _ in range(10):
        b.add_item(np.concatenate([rng.integers(4, 9, size=rng.integers(3, 8)), [2]]))
    b.finalize()

    task = setup_task({"_name": "language_modeling", "data": str(tmp_path),
                       "tokens_per_sample": 16, "sample_break_mode": "none"})
    task.load_dataset("train")
    itr = task.make_batch_iterator(task.dataset("train"), max_sentences=4,
                                   num_length_buckets=2).next_epoch_itr(shuffle=False)
    batch = next(iter(itr))
    assert batch["net_tokens"].shape == batch["target"].shape
    # shifted-by-one LM pair
    np.testing.assert_array_equal(batch["net_tokens"][0, 1:4], batch["target"][0, :3])

    # criterion + tiny LM trains
    import jax
    import jax.numpy as jnp

    from chimera_st_tpu.config.registry import CRITERIONS
    from chimera_st_tpu.models.transformer_mt import TransformerLM, TransformerLMConfig

    lm = TransformerLM(TransformerLMConfig(vocab_size=len(d), embed_dim=16,
                                           ffn_dim=32, layers=1, heads=2))
    params = lm.init(jax.random.PRNGKey(0), jnp.asarray(batch["net_tokens"]))
    crit = CRITERIONS.get("lm_cross_entropy")({"padding_idx": 1})
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "id"}
    loss, ss, logging = crit(lm, params, dev_batch, train=False)
    assert np.isfinite(float(loss))


def test_shorten_dataset_methods(tmp_path):
    """--shorten-method truncate|random_crop before LM block building
    (reference: fairseq/data/shorten_dataset.py)."""
    from chimera_st_tpu.tasks.language_modeling import ShortenedDataset

    class _Base:
        sizes = [12, 3]

        def __len__(self):
            return 2

        def __getitem__(self, i):
            return np.arange(self.sizes[i]) + 10

    s = ShortenedDataset(_Base(), 5, "truncate")
    np.testing.assert_array_equal(s[0], np.arange(5) + 10)
    np.testing.assert_array_equal(s[1], np.arange(3) + 10)  # short: untouched
    assert list(s.sizes) == [5, 3]

    r = ShortenedDataset(_Base(), 5, "random_crop", seed=3)
    win = r[0]
    assert len(win) == 5 and win[0] >= 10 and win[-1] <= 21
    np.testing.assert_array_equal(win, r[0])  # deterministic per (seed, idx)


def test_eval_lm_cli_and_context_window(tmp_path, capsys):
    """chimera-eval-lm end to end, then with --context-window (sliding
    window whose context positions carry no loss — perplexity changes but
    token count does not; reference eval_lm.py + LMContextWindowDataset)."""
    from chimera_st_tpu.cli import eval_lm, train
    from chimera_st_tpu.data.dictionary import Dictionary
    from chimera_st_tpu.data.indexed_dataset import MMapIndexedDatasetBuilder

    d = Dictionary()
    for w in "a b c d e".split():
        d.add_symbol(w)
    d.save(str(tmp_path / "dict.txt"))
    rng = np.random.default_rng(1)
    for split in ("train", "test"):
        b = MMapIndexedDatasetBuilder(str(tmp_path / split))
        for _ in range(8):
            b.add_item(
                np.concatenate([rng.integers(4, 9, size=rng.integers(3, 8)), [2]])
            )
        b.finalize()

    save = str(tmp_path / "ckpt")
    train.main([
        str(tmp_path), "--task", "language_modeling",
        "--arch", "transformer_lm", "--embed-dim", "16", "--ffn-dim", "32",
        "--layers", "1", "--heads", "2", "--tokens-per-sample", "12",
        "--criterion", "lm_cross_entropy", "--optimizer", "adam",
        "--lr", "1e-3", "--lr-scheduler", "fixed", "--batch-size", "4",
        "--max-update", "2", "--save-dir", save, "--dtype", "float32",
        "--disable-validation", "--num-length-buckets", "1",
    ])

    eval_lm.main([
        str(tmp_path), "--path", f"{save}/checkpoint_last.ckpt",
        "--tokens-per-sample", "12", "--batch-size", "4",
        "--dtype", "float32", "--num-length-buckets", "1",
    ])
    out1 = capsys.readouterr().out
    assert "perplexity" in out1
    n1 = int(out1.split("Evaluated ")[1].split(" tokens")[0])

    eval_lm.main([
        str(tmp_path), "--path", f"{save}/checkpoint_last.ckpt",
        "--tokens-per-sample", "12", "--context-window", "4",
        "--batch-size", "4", "--dtype", "float32",
        "--num-length-buckets", "1",
    ])
    out2 = capsys.readouterr().out
    assert "perplexity" in out2
    n2 = int(out2.split("Evaluated ")[1].split(" tokens")[0])
    assert n1 == n2  # same scored tokens, different conditioning
