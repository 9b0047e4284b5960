"""flax GPT-2 parity vs transformers' GPT2LMHeadModel (reference capability:
fairseq/models/huggingface/hf_gpt2.py wraps the torch model; here the HF
checkpoint is IMPORTED into a TPU-native flax GPT-2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import chimera_st_tpu.models  # noqa: F401
from chimera_st_tpu.models.hf_gpt2 import (
    GPT2Config,
    GPT2LM,
    import_hf_gpt2_state_dict,
)


@pytest.fixture(scope="module")
def tiny_pair():
    import torch
    from transformers import GPT2Config as HFConfig, GPT2LMHeadModel

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=50, n_positions=32, n_embd=16, n_layer=2, n_head=2,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    hf = GPT2LMHeadModel(hf_cfg).eval()
    cfg = GPT2Config(vocab_size=50, n_positions=32, n_embd=16, n_layer=2,
                     n_head=2, dropout=0.0)
    model = GPT2LM(cfg)
    params = import_hf_gpt2_state_dict(hf.state_dict())
    return hf, model, params


def test_logits_match_transformers(tiny_pair):
    import torch

    hf, model, params = tiny_pair
    rng = np.random.default_rng(0)
    toks = rng.integers(0, 50, size=(3, 12)).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(toks)).logits.numpy()
    got = np.asarray(model.apply(params, jnp.asarray(toks, jnp.int32)))
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_causal(tiny_pair):
    _, model, params = tiny_pair
    t1 = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    t2 = t1.at[0, 3].set(9)
    l1 = np.asarray(model.apply(params, t1))
    l2 = np.asarray(model.apply(params, t2))
    np.testing.assert_allclose(l1[0, :3], l2[0, :3], atol=1e-5)


def test_lm_criterion_drives_gpt2(tiny_pair):
    import chimera_st_tpu.tasks  # noqa: F401

    from chimera_st_tpu.config.registry import CRITERIONS

    _, model, params = tiny_pair
    rng = np.random.default_rng(1)
    tgt = rng.integers(4, 50, size=(2, 8)).astype(np.int32)
    batch = {
        "net_tokens": jnp.asarray(
            np.concatenate([np.full((2, 1), 2, np.int32), tgt[:, :-1]], 1)
        ),
        "target": jnp.asarray(tgt),
        "ntokens": jnp.asarray(16.0),
    }
    crit = CRITERIONS.get("lm_cross_entropy")({"padding_idx": 1})
    loss, ss, logging = crit(model, params, batch, train=False)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: crit(model, p, batch, train=False)[0])(params)
    assert all(
        np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g)
    )
