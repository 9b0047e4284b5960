"""Synthetic benchmark tasks (reference: fairseq/benchmark/dummy_*.py)."""

import numpy as np

from chimera_st_tpu.tasks import setup_task


def test_dummy_mt_batches():
    task = setup_task({"_name": "dummy_mt", "dict_size": 100,
                       "src_len": 8, "tgt_len": 8, "dataset_size": 64})
    task.load_dataset("train")
    itr = task.make_batch_iterator(task.dataset("train"), max_sentences=16,
                                   num_length_buckets=1).next_epoch_itr()
    batch = next(iter(itr))
    assert batch["src_tokens"].shape == (16, 8)
    assert batch["target"].shape == (16, 8)
    assert batch["prev_output_tokens"][0, 0] == task.target_dictionary.eos()


def test_dummy_lm_batches():
    task = setup_task({"_name": "dummy_lm", "dict_size": 100,
                       "tokens_per_sample": 16, "dataset_size": 32})
    task.load_dataset("train")
    itr = task.make_batch_iterator(task.dataset("train"), max_sentences=8,
                                   num_length_buckets=1).next_epoch_itr()
    batch = next(iter(itr))
    assert batch["net_tokens"].shape == (8, 16)
    # next-token shift
    np.testing.assert_array_equal(batch["net_tokens"][0, 1:],
                                  batch["target"][0, :-1])
