import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_st_tpu.models import build_model_from_arch
from chimera_st_tpu.models.interlingua import (
    ChimeraInterlinguaModel,
    InterlinguaConfig,
)

TINY = InterlinguaConfig(
    tgt_vocab_size=20,
    src_vocab_size=16,
    encoder_embed_dim=16,
    encoder_ffn_dim=32,
    encoder_layers=2,
    encoder_heads=2,
    decoder_embed_dim=16,
    decoder_ffn_dim=32,
    decoder_layers=2,
    decoder_heads=2,
    interlingua_length=4,
    interlingua_layers=2,
    conv_kernel_sizes=(5, 5),
    conv_channels=8,
    w2v2_embed_dim=16,
    w2v2_ffn_dim=32,
    w2v2_layers=2,
    w2v2_heads=2,
    w2v2_conv_spec=((8, 10, 5), (12, 3, 2)),  # 12 != 16: exercises post_extract_proj
    w2v2_conv_pos=8,
    w2v2_conv_pos_groups=4,
    max_target_positions=64,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = ChimeraInterlinguaModel(TINY)
    wav = jnp.zeros((2, 400), jnp.float32)
    wav_mask = jnp.zeros((2, 400), bool)
    src = jnp.zeros((2, 4), jnp.int32)
    prev = jnp.zeros((2, 5), jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), wav, wav_mask, src, prev,
        method=ChimeraInterlinguaModel.init_everything,
    )
    return model, params


def test_audio_path_shapes(model_and_params):
    model, params = model_and_params
    wav = jnp.asarray(np.random.default_rng(0).normal(size=(2, 400)), jnp.float32)
    mask = jnp.zeros((2, 400), bool).at[1, 250:].set(True)
    mem, mem_mask = model.apply(params, wav, mask, method=ChimeraInterlinguaModel.encode_audio)
    assert mem.shape == (2, TINY.interlingua_length, TINY.encoder_embed_dim)
    assert mem_mask is None
    assert np.isfinite(np.asarray(mem)).all()


def test_text_path_shapes(model_and_params):
    model, params = model_and_params
    toks = jnp.asarray([[4, 5, 6, 2], [7, 8, 2, 1]], jnp.int32)  # 1 = pad
    mem, mem_mask = model.apply(params, toks, method=ChimeraInterlinguaModel.encode_text)
    assert mem.shape == (2, TINY.interlingua_length, TINY.encoder_embed_dim)
    assert mem_mask is None


def test_memory_slot0_is_zero_embedding(model_and_params):
    """Reference quirk: interlingua Embedding(M, D, padding_idx=0) pins slot 0
    to a zero vector at init (w2v2_transformer_interlingua.py:173-174)."""
    model, params = model_and_params
    table = params["params"]["interlingua_embedding"]["embedding"]
    # raw param row may be anything; the effective table zeroes row 0
    toks = jnp.asarray([[4, 2]], jnp.int32)
    # effective memory table: check via gradient-frozen zero row semantics
    from chimera_st_tpu.models.embedding import Embed

    emb = Embed(TINY.interlingua_length, TINY.encoder_embed_dim, padding_idx=0)
    eff = emb.apply(
        {"params": {"embedding": table}}, method=Embed.table
    )
    np.testing.assert_allclose(np.asarray(eff[0]), 0.0)


def test_st_logits_and_internal(model_and_params):
    model, params = model_and_params
    wav = jnp.asarray(np.random.default_rng(1).normal(size=(2, 400)), jnp.float32)
    mask = jnp.zeros((2, 400), bool)
    prev = jnp.asarray([[2, 4, 5], [2, 6, 7]], jnp.int32)
    logits, mem = model.apply(
        params, wav, mask, prev,
        method=ChimeraInterlinguaModel.forward_audio_with_internal,
    )
    assert logits.shape == (2, 3, TINY.tgt_vocab_size)
    assert mem.shape == (2, TINY.interlingua_length, TINY.encoder_embed_dim)


def test_mt_path(model_and_params):
    model, params = model_and_params
    src = jnp.asarray([[4, 5, 2], [6, 2, 1]], jnp.int32)
    prev = jnp.asarray([[2, 4, 5], [2, 6, 7]], jnp.int32)
    logits, mem = model.apply(
        params, src, prev, method=ChimeraInterlinguaModel.forward_text_with_internal
    )
    assert logits.shape == (2, 3, TINY.tgt_vocab_size)


def test_audio_text_share_memory_space(model_and_params):
    """Audio and text memories live in the same [B, M, D] space — the core
    Chimera property enabling the contrastive alignment loss."""
    model, params = model_and_params
    wav = jnp.asarray(np.random.default_rng(2).normal(size=(1, 400)), jnp.float32)
    mem_a, _ = model.apply(
        params, wav, jnp.zeros((1, 400), bool),
        method=ChimeraInterlinguaModel.encode_audio,
    )
    mem_t, _ = model.apply(
        params, jnp.asarray([[4, 5, 2]], jnp.int32),
        method=ChimeraInterlinguaModel.encode_text,
    )
    assert mem_a.shape == mem_t.shape


def test_jit_compiles_audio_path(model_and_params):
    model, params = model_and_params
    wav = jnp.zeros((2, 400), jnp.float32)
    mask = jnp.zeros((2, 400), bool)
    prev = jnp.zeros((2, 5), jnp.int32)
    fn = jax.jit(lambda p, w, m, t: model.apply(p, w, m, t))
    out = fn(params, wav, mask, prev)
    assert out.shape == (2, 5, TINY.tgt_vocab_size)


def test_build_from_arch_registry():
    model = build_model_from_arch(
        "s2t_transformer_w2v2_interlingua_base",
        {"tgt_vocab_size": 32, "src_vocab_size": 24, "encoder_layers": 1,
         "decoder_layers": 1, "interlingua_layers": 1, "w2v2_layers": 1},
    )
    assert model.cfg.encoder_embed_dim == 512
    assert model.cfg.interlingua_length == 16
    assert model.cfg.decoder_ffn_dim == 2048


def test_no_interlingua_variant():
    cfg = InterlinguaConfig(
        **{**TINY.__dict__, "no_interlingua": True}
    )
    model = ChimeraInterlinguaModel(cfg)
    wav = jnp.zeros((1, 400), jnp.float32)
    mask = jnp.zeros((1, 400), bool)
    prev = jnp.zeros((1, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), wav, mask, prev)
    enc, enc_mask = model.apply(params, wav, mask, method=ChimeraInterlinguaModel.encode_audio)
    # no memory bottleneck: encoder output keeps temporal resolution
    assert enc.shape[1] == cfg.audio_output_length(400)
    assert enc_mask is not None
