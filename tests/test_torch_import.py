"""End-to-end checkpoint-import parity: random torch reference model ->
fairseq-style state dict -> importer -> flax model must produce the same
outputs on both modalities (this is the gate for loading released
Chimera_EN2XX.pt / wav2vec_small.pt checkpoints)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from chimera_st_tpu.checkpoint.torch_import import (
    import_interlingua_state_dict,
    infer_interlingua_config,
)
from chimera_st_tpu.models.interlingua import ChimeraInterlinguaModel
from tests.test_interlingua_model import TINY
from tests.torch_reference import TorchChimera


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    tref = TorchChimera(TINY).eval()
    sd = tref.state_dict()
    params = {"params": import_interlingua_state_dict(sd)}
    model = ChimeraInterlinguaModel(TINY)
    return tref, model, params


def test_audio_path_parity(pair):
    tref, model, params = pair
    rng = np.random.default_rng(0)
    wav = rng.normal(size=(2, 400)).astype(np.float32)
    mask = np.zeros((2, 400), bool)
    mask[1, 250:] = True
    prev = np.array([[2, 4, 5, 6], [2, 7, 8, 1]], np.int64)

    with torch.no_grad():
        ref_logits, ref_mem = tref.forward_audio(
            torch.tensor(wav), torch.tensor(mask), torch.tensor(prev)
        )
    logits, mem = model.apply(
        params,
        jnp.asarray(wav),
        jnp.asarray(mask),
        jnp.asarray(prev, jnp.int32),
        method=ChimeraInterlinguaModel.forward_audio_with_internal,
    )
    np.testing.assert_allclose(np.asarray(mem), ref_mem.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(), atol=2e-3)


def test_text_path_parity(pair):
    tref, model, params = pair
    src = np.array([[4, 5, 6, 7, 2], [8, 9, 2, 1, 1]], np.int64)
    prev = np.array([[2, 4, 5], [2, 6, 1]], np.int64)
    with torch.no_grad():
        ref_logits, ref_mem = tref.forward_text(torch.tensor(src), torch.tensor(prev))
    logits, mem = model.apply(
        params,
        jnp.asarray(src, jnp.int32),
        jnp.asarray(prev, jnp.int32),
        method=ChimeraInterlinguaModel.forward_text_with_internal,
    )
    np.testing.assert_allclose(np.asarray(mem), ref_mem.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(), atol=2e-3)


def test_unmatched_keys_rejected(pair):
    tref, model, params = pair
    sd = dict(tref.state_dict())
    sd["encoder.mystery_module.weight"] = torch.zeros(3)
    with pytest.raises(ValueError, match="unmatched"):
        import_interlingua_state_dict(sd)


def test_skip_patterns_accepted(pair):
    tref, model, params = pair
    sd = dict(tref.state_dict())
    sd["encoder.embed_positions._float_tensor"] = torch.zeros(1)
    sd["decoder.embed_positions._float_tensor"] = torch.zeros(1)
    sd["encoder.stashed_weights"] = torch.zeros(1)
    import_interlingua_state_dict(sd)  # should not raise


def test_w2v2_pretraining_heads_dropped(pair):
    """Real Chimera fine-tune checkpoints carry the trunk's pretraining-only
    tensors (fairseq Wav2Vec2Model registers mask_emb unconditionally;
    quantizer/project_q/final_proj when configured) — the importer must drop
    them, not die with unmatched-keys (review fix)."""
    tref, model, params = pair
    sd = dict(tref.state_dict())
    sd["encoder.wav2vec_model.mask_emb"] = torch.zeros(8)
    sd["encoder.wav2vec_model.quantizer.vars"] = torch.zeros(1, 4, 2)
    sd["encoder.wav2vec_model.project_q.weight"] = torch.zeros(4, 4)
    sd["encoder.wav2vec_model.final_proj.weight"] = torch.zeros(4, 4)
    p = import_interlingua_state_dict(sd)  # should not raise
    assert "mask_emb" not in p["wav2vec_model"]
    assert "quantizer" not in p["wav2vec_model"]


def test_audio_exclusive_layers_consumed(pair):
    """non_shared_encoder_layers checkpoints: the audio-exclusive stack must
    be imported AND counted as consumed (review fix: it was read through the
    raw dict, so the completeness check rejected every such checkpoint)."""
    tref, model, params = pair
    sd = dict(tref.state_dict())
    for k in list(sd):
        if k.startswith("encoder.transformer_layers.0."):
            sd[k.replace("encoder.transformer_layers.0.",
                         "encoder.audio_exclusive_layers.0.")] = sd[k]
    p = import_interlingua_state_dict(sd)  # should not raise
    assert "audio_exclusive_layers_0" in p


def test_tied_output_projection_alias(pair):
    tref, model, params = pair
    sd = dict(tref.state_dict())
    sd["decoder.output_projection.weight"] = sd["decoder.embed_tokens.weight"]
    p = import_interlingua_state_dict(sd)
    assert "output_projection" not in p["decoder"]


def test_infer_config_from_namespace():
    from argparse import Namespace

    ns = Namespace(
        encoder_embed_dim=512,
        encoder_ffn_embed_dim=2048,
        encoder_layers=12,
        encoder_attention_heads=8,
        decoder_layers=6,
        interlingua_length=64,
        interlingua_layers=3,
        conv_kernel_sizes="5,5",
        conv_channels=1024,
        activation_fn="relu",
    )
    cfg = infer_interlingua_config(ns, tgt_vocab=10000, src_vocab=10000)
    assert cfg.interlingua_length == 64
    assert cfg.encoder_embed_dim == 512
    assert cfg.conv_kernel_sizes == (5, 5)


def test_infer_config_nested_w2v_args():
    """Released checkpoints nest the wav2vec2 config as ckpt['args'].w2v_args
    (reference: w2v2_transformer.py:255-282)."""
    from argparse import Namespace

    w2v = Namespace(
        encoder_embed_dim=48,
        encoder_ffn_embed_dim=96,
        encoder_layers=2,
        encoder_attention_heads=4,
        conv_pos=16,
        conv_pos_groups=4,
        conv_feature_layers="[(16, 10, 5), (24, 3, 2)]",
    )
    ns = Namespace(
        encoder_embed_dim=32,
        encoder_layers=2,
        interlingua_length=8,
        w2v_args=w2v,
    )
    cfg = infer_interlingua_config(ns, tgt_vocab=100, src_vocab=100)
    assert cfg.w2v2_embed_dim == 48
    assert cfg.w2v2_ffn_dim == 96
    assert cfg.w2v2_layers == 2
    assert cfg.w2v2_conv_spec == ((16, 10, 5), (24, 3, 2))
    assert cfg.w2v2_conv_pos == 16
