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


def test_dummy_masked_lm_batches_and_step():
    """dummy_masked_lm (reference benchmark/dummy_masked_lm.py:17-63):
    ~1/15 positions masked, targets pad elsewhere; trains one step through
    the registry roberta alias + masked_lm criterion."""
    import jax
    import jax.numpy as jnp

    task = setup_task({"_name": "dummy_masked_lm", "dict_size": 60,
                       "tokens_per_sample": 30, "dataset_size": 16})
    task.load_dataset("train")
    itr = task.make_batch_iterator(task.dataset("train"), max_sentences=4,
                                   num_length_buckets=1).next_epoch_itr()
    batch = next(iter(itr))
    assert batch["net_tokens"].shape == (4, 30)
    d = task.target_dictionary
    mask_idx = d.index("<mask>")
    masked = batch["net_tokens"][0] == mask_idx
    assert masked.sum() == 2  # positions 0 and 15
    assert (batch["target"][0][~masked] == d.pad()).all()
    assert (batch["target"][0][masked] != d.pad()).all()

    model = task.build_model(
        {"arch": "roberta", "embed_dim": 16, "ffn_dim": 32,
         "layers": 1, "heads": 2}
    )
    assert model.cfg.vocab_size >= len(d)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["net_tokens"]))
    crit = task.build_criterion({"_name": "masked_lm"})
    loss, ss, logs = crit(
        model, params, jax.tree_util.tree_map(jnp.asarray, batch),
        rngs={"dropout": jax.random.PRNGKey(1)}, num_updates=jnp.asarray(0),
        train=True,
    )
    assert np.isfinite(float(loss))


def test_s2t_transformer_w2v2_arch_alias():
    """--arch s2t_transformer_w2v2* builds the no-memory-bank Chimera model
    (reference w2v2_transformer.py:42,480-507)."""
    from chimera_st_tpu.config.registry import ARCHITECTURES, MODELS

    for arch in ("s2t_transformer_w2v2_s", "s2t_transformer_w2v2_sp",
                 "s2t_transformer_w2v2asr_s"):
        model_name, preset = ARCHITECTURES.get(arch)
        cfg = preset({"tgt_vocab_size": 16, "w2v2_layers": 1,
                      "w2v2_embed_dim": 16, "w2v2_ffn_dim": 32,
                      "w2v2_heads": 2, "encoder_layers": 1,
                      "decoder_layers": 1, "interlingua_layers": 1})
        model = MODELS.get(model_name)(cfg)
        assert model.cfg.no_interlingua is True
        assert model.cfg.encoder_embed_dim == 256
    model_name, preset = ARCHITECTURES.get("s2t_transformer_w2v2_sp")
    assert preset({})["encoder_layers"] == 16
