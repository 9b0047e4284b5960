"""Baseline fbank speech-to-text transformer
(reference: fairseq/models/speech_to_text/s2t_transformer.py:82-390
S2TTransformerModel — 80-d log-mel input, Conv1d+GLU subsampler, transformer
encoder/decoder; archs s2t_transformer_s/_m/_l).

Pairs with the on-device log-mel frontend in chimera_st_tpu.ops.fbank when
``compute_fbank=True`` (the reference computes fbank on the host loader)."""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.registry import register_model, register_model_architecture
from .layers import (
    LayerNorm,
    TransformerEncoderLayer,
    positional_embedding_from_mask,
)
from .subsampler import Conv1dSubsampler, subsampled_length
from .transformer_decoder import TransformerDecoder

Dtype = Any


@dataclass(frozen=True)
class S2TTransformerConfig:
    tgt_vocab_size: int = 8
    padding_idx: int = 1
    input_feat_per_channel: int = 80
    conv_kernel_sizes: Tuple[int, ...] = (5, 5)
    conv_channels: int = 1024
    encoder_embed_dim: int = 256
    encoder_ffn_dim: int = 2048
    encoder_layers: int = 12
    encoder_heads: int = 4
    encoder_normalize_before: bool = True
    decoder_embed_dim: int = 256
    decoder_ffn_dim: int = 2048
    decoder_layers: int = 6
    decoder_heads: int = 4
    decoder_normalize_before: bool = True
    share_decoder_input_output_embed: bool = True
    max_target_positions: int = 1024
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    activation: str = "relu"
    no_scale_embedding: bool = False
    compute_fbank: bool = False  # True: input is raw wave, mel runs on-device


class S2TTransformerModel(nn.Module):
    cfg: S2TTransformerConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.subsample = Conv1dSubsampler(
            c.input_feat_per_channel,
            c.conv_channels,
            c.encoder_embed_dim,
            c.conv_kernel_sizes,
            name="subsample",
            **common,
        )
        self.transformer_layers = [
            TransformerEncoderLayer(
                c.encoder_embed_dim, c.encoder_ffn_dim, c.encoder_heads,
                dropout=c.dropout, attention_dropout=c.attention_dropout,
                activation_dropout=c.activation_dropout, activation=c.activation,
                normalize_before=c.encoder_normalize_before,
                name=f"transformer_layers_{i}", **common,
            )
            for i in range(c.encoder_layers)
        ]
        if c.encoder_normalize_before:
            self.encoder_layer_norm = LayerNorm(
                c.encoder_embed_dim, dtype=self.dtype, name="encoder_layer_norm"
            )
        self.decoder = TransformerDecoder(
            vocab_size=c.tgt_vocab_size,
            embed_dim=c.decoder_embed_dim,
            ffn_dim=c.decoder_ffn_dim,
            num_layers=c.decoder_layers,
            num_heads=c.decoder_heads,
            dropout=c.dropout,
            attention_dropout=c.attention_dropout,
            activation_dropout=c.activation_dropout,
            activation=c.activation,
            normalize_before=c.decoder_normalize_before,
            padding_idx=c.padding_idx,
            share_input_output_embed=c.share_decoder_input_output_embed,
            no_scale_embedding=c.no_scale_embedding,
            max_target_positions=c.max_target_positions,
            name="decoder", **common,
        )
        self.embed_scale = (
            1.0 if c.no_scale_embedding else math.sqrt(c.encoder_embed_dim)
        )
        self.dropout_layer = nn.Dropout(c.dropout)

    def encode_audio(
        self,
        features: jax.Array,  # [B, T, F] fbank (or [B, T] wave w/ compute_fbank)
        padding_mask: jax.Array,  # [B, T]
        deterministic: bool = True,
    ):
        c = self.cfg
        if c.compute_fbank:
            lengths = jnp.sum(~padding_mask, axis=-1)
            if jax.default_backend() == "tpu":
                from ..ops.pallas_logmel import logmel_pallas

                features = logmel_pallas(
                    features, num_mel_bins=c.input_feat_per_channel
                )
            else:
                from ..ops.fbank import logmel_jax

                features = logmel_jax(
                    features, num_mel_bins=c.input_feat_per_channel
                )
            frame_len, frame_shift = 400, 160
            flen = jnp.maximum(1 + (lengths - frame_len) // frame_shift, 0)
            pos = jnp.arange(features.shape[1])[None, :]
            padding_mask = pos >= flen[:, None]
        x = self.subsample(features.astype(self.dtype))
        lengths = jnp.sum(~padding_mask, axis=-1)
        for _ in c.conv_kernel_sizes:
            lengths = (lengths - 1) // 2 + 1
        pos = jnp.arange(x.shape[1])[None, :]
        sub_mask = pos >= lengths[:, None]

        x = self.embed_scale * x
        pe = positional_embedding_from_mask(sub_mask, c.encoder_embed_dim, c.padding_idx)
        x = x + pe.astype(x.dtype)
        x = self.dropout_layer(x, deterministic=deterministic)
        for layer in self.transformer_layers:
            x = layer(x, encoder_padding_mask=sub_mask, deterministic=deterministic)
        if c.encoder_normalize_before:
            x = self.encoder_layer_norm(x)
        return x, sub_mask

    def __call__(self, features, padding_mask, prev_output_tokens,
                 deterministic: bool = True):
        enc, enc_mask = self.encode_audio(features, padding_mask, deterministic)
        return self.decoder(
            prev_output_tokens, enc, enc_mask, deterministic=deterministic
        )

    def forward_audio_with_internal(self, features, padding_mask,
                                    prev_output_tokens, deterministic: bool = True):
        enc, enc_mask = self.encode_audio(features, padding_mask, deterministic)
        logits = self.decoder(prev_output_tokens, enc, enc_mask,
                              deterministic=deterministic)
        return logits, enc


@register_model("s2t_transformer")
def build_s2t_transformer(cfg_dict: Dict, dtype=jnp.float32, param_dtype=jnp.float32):
    known = {f.name for f in dataclasses.fields(S2TTransformerConfig)}
    cfg = S2TTransformerConfig(**{k: v for k, v in cfg_dict.items() if k in known})
    return S2TTransformerModel(cfg, dtype=dtype, param_dtype=param_dtype)


@register_model_architecture("s2t_transformer", "s2t_transformer")
def s2t_base(cfg: Dict) -> Dict:
    """Base preset (reference s2t_transformer.py:392 base_architecture:
    512-d, 2048 ffn, 12+6 layers, 8 heads — the dataclass defaults here are
    the smaller `_s` values, so the base widths are set explicitly)."""
    d = dict(cfg)
    d.setdefault("encoder_embed_dim", 512)
    d.setdefault("encoder_ffn_dim", 2048)
    d.setdefault("encoder_heads", 8)
    d.setdefault("decoder_embed_dim", 512)
    d.setdefault("decoder_ffn_dim", 2048)
    d.setdefault("decoder_heads", 8)
    return d


@register_model_architecture("s2t_transformer", "s2t_transformer_s")
def s2t_s(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("encoder_embed_dim", 256)
    d.setdefault("encoder_ffn_dim", 2048)
    d.setdefault("encoder_heads", 4)
    d.setdefault("decoder_embed_dim", 256)
    d.setdefault("decoder_ffn_dim", 2048)
    d.setdefault("decoder_heads", 4)
    return d


@register_model_architecture("s2t_transformer", "s2t_transformer_m")
def s2t_m(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("encoder_embed_dim", 512)
    d.setdefault("encoder_ffn_dim", 2048)
    d.setdefault("encoder_heads", 8)
    d.setdefault("decoder_embed_dim", 512)
    d.setdefault("decoder_heads", 8)
    d.setdefault("dropout", 0.15)
    return d


@register_model_architecture("s2t_transformer", "s2t_transformer_l")
def s2t_l(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("encoder_embed_dim", 1024)
    d.setdefault("encoder_ffn_dim", 4096)
    d.setdefault("encoder_heads", 16)
    d.setdefault("decoder_embed_dim", 1024)
    d.setdefault("decoder_heads", 16)
    d.setdefault("dropout", 0.2)
    return d


# reference arch-name parity (s2t_transformer.py:440-478): *p = deep
# 16-encoder-layer variants


@register_model_architecture("s2t_transformer", "s2t_transformer_sp")
def s2t_sp(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("encoder_layers", 16)
    return s2t_s(d)


@register_model_architecture("s2t_transformer", "s2t_transformer_mp")
def s2t_mp(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("encoder_layers", 16)
    return s2t_m(d)


@register_model_architecture("s2t_transformer", "s2t_transformer_lp")
def s2t_lp(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("encoder_layers", 16)
    return s2t_l(d)
