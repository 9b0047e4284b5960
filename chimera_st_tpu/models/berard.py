"""Berard RNN speech-translation model.

reference: fairseq/models/speech_to_text/berard.py ("End-to-End Automatic
Speech Translation of Audiobooks", Berard et al. 2018): 2x strided Conv2D
subsampling over fbank features -> stacked (bi)LSTM encoder -> LSTM decoder
with MLP (Bahdanau) attention. TPU deltas as in models/lstm.py: attention is
applied to the full decoder state sequence post-recurrence (input feeding
would serialize the attention matmuls inside the scan)."""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.registry import register_model, register_model_architecture
from .embedding import Embed

Dtype = Any


@dataclass(frozen=True)
class BerardConfig:
    tgt_vocab_size: int = 8
    padding_idx: int = 1
    input_feat_per_channel: int = 80
    conv_channels: Tuple[int, ...] = (16, 16)
    conv_kernel: int = 3
    conv_stride: int = 2
    lstm_size: int = 256
    encoder_layers: int = 3
    bidirectional: bool = True
    decoder_embed_dim: int = 128
    decoder_hidden: int = 512
    decoder_layers: int = 2
    attention_dim: int = 512
    dropout: float = 0.2


class MLPAttention(nn.Module):
    """Bahdanau additive attention (reference: berard.py MLPAttention)."""

    attention_dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, enc, enc_mask):
        # queries [B, T, H], enc [B, S, C]
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        q = nn.Dense(self.attention_dim, use_bias=True, name="query_proj", **common)(queries)
        k = nn.Dense(self.attention_dim, use_bias=False, name="context_proj", **common)(enc)
        e = jnp.tanh(q[:, :, None, :] + k[:, None, :, :])  # [B, T, S, A]
        scores = nn.Dense(1, use_bias=False, name="score_proj", **common)(e)[..., 0]
        scores = jnp.where(enc_mask[:, None, :], -1e8, scores)
        w = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(enc.dtype)
        return jnp.einsum("bts,bsc->btc", w, enc)


class BerardModel(nn.Module):
    cfg: BerardConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.convs = [
            nn.Conv(ch, (c.conv_kernel, c.conv_kernel),
                    strides=(c.conv_stride, c.conv_stride), padding="SAME",
                    name=f"conv_{i}", **common)
            for i, ch in enumerate(c.conv_channels)
        ]
        rnn = lambda name: nn.RNN(nn.LSTMCell(c.lstm_size, **common), name=name)
        self.enc_rnns = [rnn(f"enc_rnn_{i}") for i in range(c.encoder_layers)]
        if c.bidirectional:
            self.enc_rnns_rev = [rnn(f"enc_rnn_rev_{i}")
                                 for i in range(c.encoder_layers)]
        self.embed_tokens = Embed(c.tgt_vocab_size, c.decoder_embed_dim,
                                  padding_idx=c.padding_idx,
                                  name="embed_tokens", **common)
        dec_rnn = lambda name: nn.RNN(nn.LSTMCell(c.decoder_hidden, **common), name=name)
        self.dec_rnns = [dec_rnn(f"dec_rnn_{i}") for i in range(c.decoder_layers)]
        self.attention = MLPAttention(c.attention_dim, name="attention", **common)
        self.output_projection = nn.Dense(c.tgt_vocab_size,
                                          name="output_projection", **common)
        self.dropout_layer = nn.Dropout(c.dropout)

    def encode_audio(self, features, padding_mask, deterministic: bool = True):
        """features [B, T, F] fbank, padding_mask [B, T] True = pad."""
        c = self.cfg
        x = features[..., None]  # [B, T, F, 1]
        lengths = jnp.sum(~padding_mask, axis=1)
        for conv in self.convs:
            x = jax.nn.tanh(conv(x))
            lengths = (lengths + c.conv_stride - 1) // c.conv_stride
        B, T2, F2, C2 = x.shape
        x = x.reshape(B, T2, F2 * C2)
        mask = jnp.arange(T2)[None, :] >= lengths[:, None]
        for i in range(c.encoder_layers):
            fwd = self.enc_rnns[i](x)
            if c.bidirectional:
                bwd = self.enc_rnns_rev[i](x, reverse=True, keep_order=True)
                x = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                x = fwd
            x = self.dropout_layer(x, deterministic=deterministic)
        return x, mask

    def __call__(self, features, padding_mask, prev_output_tokens,
                 deterministic: bool = True):
        enc, enc_mask = self.encode_audio(features, padding_mask, deterministic)
        y = self.embed_tokens(prev_output_tokens)
        y = self.dropout_layer(y, deterministic=deterministic)
        for rnn in self.dec_rnns:
            y = rnn(y)
        ctx = self.attention(y, enc, enc_mask)
        y = jnp.concatenate([y, ctx], axis=-1)
        y = self.dropout_layer(y, deterministic=deterministic)
        return self.output_projection(y).astype(jnp.float32)


@register_model("s2t_berard")
def build_berard(cfg_dict: Dict, dtype=jnp.float32, param_dtype=jnp.float32):
    known = {f.name for f in dataclasses.fields(BerardConfig)}
    kw = {k: v for k, v in cfg_dict.items() if k in known}
    if "conv_channels" in kw and not isinstance(kw["conv_channels"], tuple):
        kw["conv_channels"] = tuple(kw["conv_channels"])
    return BerardModel(BerardConfig(**kw), dtype=dtype, param_dtype=param_dtype)


@register_model_architecture("s2t_berard", "s2t_berard")
def berard_base(cfg: Dict) -> Dict:
    return dict(cfg)


@register_model_architecture("s2t_berard", "s2t_berard_256_3_3")
def berard_256(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("lstm_size", 256)
    d.setdefault("encoder_layers", 3)
    d.setdefault("decoder_layers", 3)
    return d


def _berard_512(cfg: Dict, encoder_layers: int, decoder_layers: int) -> Dict:
    """The 512-unit presets (reference berard.py:583-609 s2t_berard_512_3_2 /
    s2t_berard_512_5_3: lstm 512, dropout 0.3, decoder embed 256 / hidden
    1024, output dim 256 — the repo's decoder reads output width off
    decoder_embed_dim)."""
    d = dict(cfg)
    d.setdefault("lstm_size", 512)
    d.setdefault("dropout", 0.3)
    d.setdefault("decoder_embed_dim", 256)
    d.setdefault("decoder_hidden", 1024)
    d.setdefault("attention_dim", 512)
    d.setdefault("encoder_layers", encoder_layers)
    d.setdefault("decoder_layers", decoder_layers)
    return d


@register_model_architecture("s2t_berard", "s2t_berard_512_3_2")
def berard_512_3_2(cfg: Dict) -> Dict:
    return _berard_512(cfg, encoder_layers=3, decoder_layers=2)


@register_model_architecture("s2t_berard", "s2t_berard_512_5_3")
def berard_512_5_3(cfg: Dict) -> Dict:
    return _berard_512(cfg, encoder_layers=5, decoder_layers=3)
