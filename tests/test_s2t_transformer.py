import jax
import jax.numpy as jnp
import numpy as np

from chimera_st_tpu.models import build_model_from_arch
from chimera_st_tpu.models.s2t_transformer import (
    S2TTransformerConfig,
    S2TTransformerModel,
)

TINY = S2TTransformerConfig(
    tgt_vocab_size=20, input_feat_per_channel=8,
    conv_channels=8, encoder_embed_dim=16, encoder_ffn_dim=32,
    encoder_layers=1, encoder_heads=2, decoder_embed_dim=16,
    decoder_ffn_dim=32, decoder_layers=1, decoder_heads=2,
)


def test_fbank_model_forward():
    model = S2TTransformerModel(TINY)
    feats = jnp.asarray(np.random.default_rng(0).normal(size=(2, 20, 8)), jnp.float32)
    mask = jnp.zeros((2, 20), bool).at[1, 14:].set(True)
    prev = jnp.asarray([[2, 4, 5], [2, 6, 7]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, mask, prev)
    logits = model.apply(params, feats, mask, prev)
    assert logits.shape == (2, 3, 20)
    assert np.isfinite(np.asarray(logits)).all()


def test_on_device_fbank_path():
    import dataclasses

    cfg = dataclasses.replace(TINY, compute_fbank=True, input_feat_per_channel=80)
    model = S2TTransformerModel(cfg)
    wav = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8000)) * 0.1, jnp.float32)
    mask = jnp.zeros((1, 8000), bool)
    prev = jnp.asarray([[2, 4]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), wav, mask, prev)
    logits = model.apply(params, wav, mask, prev)
    assert logits.shape == (1, 2, 20)


def test_arch_presets():
    m = build_model_from_arch("s2t_transformer_s", {"tgt_vocab_size": 10, "encoder_layers": 1, "decoder_layers": 1})
    assert m.cfg.encoder_embed_dim == 256 and m.cfg.encoder_heads == 4
    m = build_model_from_arch("s2t_transformer_m", {"tgt_vocab_size": 10, "encoder_layers": 1, "decoder_layers": 1})
    assert m.cfg.encoder_embed_dim == 512
