"""RobertaHubInterface + transformer_from_pretrained_xlm init
(reference: roberta/hub_interface.py, transformer_from_pretrained_xlm.py)."""

import jax
import jax.numpy as jnp
import numpy as np

import chimera_st_tpu.models  # noqa: F401
from chimera_st_tpu.data.dictionary import Dictionary
from chimera_st_tpu.models import build_model_from_arch
from chimera_st_tpu.models.roberta_hub import (
    RobertaHubInterface,
    init_transformer_from_pretrained_xlm,
)


def _dict_and_model():
    d = Dictionary()
    for w in "the cat sat on mat dog ran".split():
        d.add_symbol(w)
    d.add_symbol("<mask>")
    model = build_model_from_arch("roberta_base", {
        "vocab_size": len(d), "embed_dim": 16, "ffn_dim": 32,
        "layers": 1, "heads": 2, "dropout": 0.0,
    })
    t = jnp.full((1, 4), 2, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), t)
    return d, model, params


def test_hub_encode_decode_roundtrip():
    d, model, params = _dict_and_model()
    hub = RobertaHubInterface(model, params, d)
    toks = hub.encode("the cat sat")
    assert toks[0] == d.bos() and toks[-1] == d.eos()
    assert hub.decode(toks) == "the cat sat"


def test_hub_features_and_fill_mask():
    d, model, params = _dict_and_model()
    hub = RobertaHubInterface(model, params, d)
    toks = hub.encode("the cat sat")
    feats = hub.extract_features(toks)
    assert feats.shape == (1, len(toks), 16)
    masked = toks.copy()
    masked[2] = d.index("<mask>")
    fills = hub.fill_mask(masked, mask_position=2, topk=3)
    assert len(fills) == 3
    probs = [p for _, p in fills]
    assert probs == sorted(probs, reverse=True) and probs[0] > 0


def test_hub_classification_head():
    d, model, params = _dict_and_model()
    hub = RobertaHubInterface(model, params, d)
    hub.register_classification_head("sst", num_classes=3)
    toks = hub.encode("the dog ran")
    lp = hub.predict("sst", toks)
    assert lp.shape == (1, 3)
    np.testing.assert_allclose(np.exp(lp).sum(), 1.0, rtol=1e-5)


def test_transformer_from_pretrained_xlm_init():
    V = 14
    xlm = build_model_from_arch("roberta_base", {
        "vocab_size": V, "embed_dim": 16, "ffn_dim": 32,
        "layers": 2, "heads": 2,
    })
    t = jnp.full((1, 4), 2, jnp.int32)
    xlm_params = xlm.init(jax.random.PRNGKey(1), t)

    mt = build_model_from_arch("transformer_from_pretrained_xlm", {
        "src_vocab_size": V, "tgt_vocab_size": V,
        "encoder_embed_dim": 16, "encoder_ffn_dim": 32,
        "encoder_layers": 2, "encoder_heads": 2, "decoder_layers": 1,
        "decoder_embed_dim": 16, "decoder_ffn_dim": 32, "decoder_heads": 2,
    })
    mt_params = mt.init(jax.random.PRNGKey(2), t, t)
    merged = init_transformer_from_pretrained_xlm(
        mt_params, xlm_params, init_decoder=True
    )
    # encoder embeddings + attention kernels now equal the XLM ones
    np.testing.assert_array_equal(
        merged["params"]["embed_tokens"]["embedding"],
        xlm_params["params"]["embed_tokens"]["embedding"],
    )
    np.testing.assert_array_equal(
        merged["params"]["layers_0"]["self_attn"]["q_proj"]["kernel"],
        xlm_params["params"]["layers_0"]["self_attn"]["q_proj"]["kernel"],
    )
    np.testing.assert_array_equal(
        merged["params"]["decoder"]["embed_tokens"]["embedding"],
        xlm_params["params"]["embed_tokens"]["embedding"],
    )
    # decoder layers keep their own init (no counterpart in the XLM tree)
    assert not np.array_equal(
        merged["params"]["decoder"]["layers_0"]["self_attn"]["q_proj"]["kernel"],
        xlm_params["params"]["layers_0"]["self_attn"]["q_proj"]["kernel"],
    )
    # model still runs
    logits = mt.apply(merged, t, t)
    assert np.isfinite(np.asarray(logits)).all()


def test_hub_aligned_features_identity():
    """1:1 word<->token alignment (reference: roberta/alignment_utils.py via
    hub extract_features_aligned_to_words)."""
    d, model, params = _dict_and_model()
    hub = RobertaHubInterface(model, params, d)
    labels, feats = hub.extract_features_aligned_to_words("the cat sat")
    assert labels == ["<s>", "the", "cat", "sat", "</s>"]
    raw = hub.extract_features(hub.encode("the cat sat"))[0]
    assert feats.shape == raw.shape
    # 1:1 alignment with count-1 weights is the identity
    np.testing.assert_allclose(feats, raw, atol=1e-6)


def test_hub_aligned_features_multi_bpe_word():
    """A word built from several BPE pieces sums their features; a BPE piece
    spanning several words is split across them (mass conservation is
    asserted inside align_features_to_words, reference :96)."""
    d = Dictionary()
    for w in ["ca", "t", "thecat"]:
        d.add_symbol(w)
    model = build_model_from_arch("roberta_base", {
        "vocab_size": len(d), "embed_dim": 16, "ffn_dim": 32,
        "layers": 1, "heads": 2, "dropout": 0.0,
    })
    t = jnp.full((1, 4), 2, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), t)
    hub = RobertaHubInterface(model, params, d)

    # word "cat" <- pieces ["ca", "t"]
    labels, feats = hub.extract_features_aligned_to_words("ca t", words=["cat"])
    assert labels == ["<s>", "cat", "</s>"]
    raw = hub.extract_features(hub.encode("ca t"))[0]
    np.testing.assert_allclose(feats[1], raw[1] + raw[2], atol=1e-5)

    # piece "thecat" -> words ["the", "cat"]: each word gets half
    labels, feats = hub.extract_features_aligned_to_words(
        "thecat", words=["the", "cat"]
    )
    assert labels == ["<s>", "the", "cat", "</s>"]
    raw = hub.extract_features(hub.encode("thecat"))[0]
    np.testing.assert_allclose(feats[1], raw[1] / 2, atol=1e-5)
    np.testing.assert_allclose(feats[2], raw[1] / 2, atol=1e-5)

    # character streams that cannot match raise
    import pytest

    with pytest.raises(ValueError):
        hub.align_bpe_to_words(hub.encode("ca t"), ["dog"])
