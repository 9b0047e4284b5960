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
