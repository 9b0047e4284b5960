import jax
import jax.numpy as jnp
import numpy as np

from chimera_st_tpu.models import build_model_from_arch
from chimera_st_tpu.models.transformer_mt import (
    TransformerLM,
    TransformerLMConfig,
    TransformerMTConfig,
    TransformerModel,
)

TINY_MT = TransformerMTConfig(
    src_vocab_size=20, tgt_vocab_size=24,
    encoder_embed_dim=16, encoder_ffn_dim=32, encoder_layers=2, encoder_heads=2,
    decoder_embed_dim=16, decoder_ffn_dim=32, decoder_layers=2, decoder_heads=2,
)


def test_mt_forward_and_padding_invariance():
    model = TransformerModel(TINY_MT)
    src = jnp.asarray([[4, 5, 6, 2, 1, 1], [7, 8, 9, 10, 11, 2]], jnp.int32)
    prev = jnp.asarray([[2, 4, 5], [2, 6, 7]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src, prev)
    logits = model.apply(params, src, prev)
    assert logits.shape == (2, 3, 24)
    # trailing pads must not change outputs vs the unpadded sequence
    src_short = jnp.asarray([[4, 5, 6, 2]], jnp.int32)
    logits_short = model.apply(params, src_short, prev[:1])
    np.testing.assert_allclose(
        np.asarray(logits[0]), np.asarray(logits_short[0]), atol=1e-5
    )


def test_mt_arch_registry():
    m = build_model_from_arch(
        "transformer_iwslt_de_en",
        {"src_vocab_size": 10, "tgt_vocab_size": 10, "encoder_layers": 1,
         "decoder_layers": 1},
    )
    assert m.cfg.encoder_ffn_dim == 1024 and m.cfg.encoder_heads == 4


def test_lm_causal():
    cfg = TransformerLMConfig(vocab_size=16, embed_dim=16, ffn_dim=32, layers=2, heads=2)
    lm = TransformerLM(cfg)
    toks = jnp.asarray([[2, 4, 5, 6, 7]], jnp.int32)
    params = lm.init(jax.random.PRNGKey(0), toks)
    logits = lm.apply(params, toks)
    assert logits.shape == (1, 5, 16)
    # causality: changing a later token must not affect earlier logits
    toks2 = toks.at[0, 4].set(9)
    logits2 = lm.apply(params, toks2)
    np.testing.assert_allclose(
        np.asarray(logits[0, :4]), np.asarray(logits2[0, :4]), atol=1e-5
    )


def test_alignment_criterion():
    """label_smoothed_cross_entropy_with_alignment adds supervised-attention
    NLL at gold links (reference:
    label_smoothed_cross_entropy_with_alignment.py)."""
    import jax

    import chimera_st_tpu.criterions  # noqa: F401
    from chimera_st_tpu.config.registry import CRITERIONS
    from chimera_st_tpu.models import build_model_from_arch

    cfg = {"src_vocab_size": 20, "tgt_vocab_size": 20,
           "encoder_embed_dim": 16, "encoder_ffn_dim": 32,
           "encoder_layers": 1, "encoder_heads": 2,
           "decoder_embed_dim": 16, "decoder_ffn_dim": 32,
           "decoder_layers": 1, "decoder_heads": 2}
    model = build_model_from_arch("transformer_iwslt_de_en", cfg)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(4, 20, size=(2, 6)), jnp.int32)
    prev = jnp.asarray(rng.integers(4, 20, size=(2, 5)), jnp.int32)
    tgt = jnp.asarray(rng.integers(4, 20, size=(2, 5)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src, prev)
    batch = {"src_tokens": src, "prev_output_tokens": prev, "target": tgt,
             "ntokens": 10.0,
             "alignment_tgt": jnp.asarray([[0, 2, -1], [1, -1, -1]]),
             "alignment_src": jnp.asarray([[1, 3, -1], [0, -1, -1]])}
    crit = CRITERIONS.get("label_smoothed_cross_entropy_with_alignment")(
        {"padding_idx": 1, "label_smoothing": 0.1, "alignment_lambda": 0.5})
    loss, ss, lg = crit(model, params, batch, train=False)
    base = CRITERIONS.get("label_smoothed_cross_entropy")(
        {"padding_idx": 1, "label_smoothing": 0.1})(
        model, params, batch, train=False)[0]
    assert float(loss) > float(base)
    assert "alignment_loss" in lg and np.isfinite(float(lg["alignment_loss"]))
