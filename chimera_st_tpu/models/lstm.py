"""LSTM encoder-decoder with attention.

reference: fairseq/models/lstm.py (Luong-style attention decoder). TPU-native:
recurrence via flax nn.RNN — the bidirectional encoder runs two scans and
concatenates. Documented delta: attention is applied to the full decoder
state sequence after the recurrence (Luong "general" without input feeding);
the reference feeds the attention output back into the next LSTM input, a
strictly sequential dependency that serializes the attention matmuls on TPU.
"""

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
class LSTMConfig:
    src_vocab_size: int = 8
    tgt_vocab_size: int = 8
    padding_idx: int = 1
    embed_dim: int = 512
    hidden_size: int = 512
    encoder_layers: int = 1
    decoder_layers: int = 1
    bidirectional: bool = False
    dropout: float = 0.1
    share_decoder_input_output_embed: bool = False
    attention: bool = True


class AttentionLayer(nn.Module):
    """Luong general attention (reference: lstm.py AttentionLayer)."""

    hidden: int
    src_dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, enc, enc_mask):
        # query [B, T, H]; enc [B, S, C]; enc_mask [B, S] True = pad
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        q = nn.Dense(self.src_dim, use_bias=False, name="input_proj", **common)(query)
        scores = jnp.einsum("btc,bsc->bts", q, enc)
        scores = jnp.where(enc_mask[:, None, :], -1e8, scores)
        w = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(enc.dtype)
        ctx = jnp.einsum("bts,bsc->btc", w, enc)
        out = jnp.tanh(
            nn.Dense(self.hidden, use_bias=False, name="output_proj", **common)(
                jnp.concatenate([ctx, query], -1)
            )
        )
        return out


class LSTMModel(nn.Module):
    cfg: LSTMConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.src_embed = Embed(c.src_vocab_size, c.embed_dim,
                               padding_idx=c.padding_idx, name="src_embed", **common)
        self.tgt_embed = Embed(c.tgt_vocab_size, c.embed_dim,
                               padding_idx=c.padding_idx, name="tgt_embed", **common)
        rnn = lambda name: nn.RNN(
            nn.OptimizedLSTMCell(c.hidden_size, **common), name=name
        )
        self.enc_rnns = [rnn(f"enc_rnn_{i}") for i in range(c.encoder_layers)]
        if c.bidirectional:
            self.enc_rnns_rev = [
                rnn(f"enc_rnn_rev_{i}") for i in range(c.encoder_layers)
            ]
        self.dec_rnns = [rnn(f"dec_rnn_{i}") for i in range(c.decoder_layers)]
        self.attn = (
            AttentionLayer(
                c.hidden_size,
                c.hidden_size * (2 if c.bidirectional else 1),
                name="attention", **common,
            )
            if c.attention
            else None
        )
        if not c.share_decoder_input_output_embed:
            self.output_projection = nn.Dense(
                c.tgt_vocab_size, use_bias=False, name="output_projection", **common
            )
        self.dropout_layer = nn.Dropout(c.dropout)

    def encode_text(self, src_tokens, deterministic: bool = True):
        c = self.cfg
        pad = src_tokens == c.padding_idx
        x = self.src_embed(src_tokens)
        x = self.dropout_layer(x, deterministic=deterministic)
        for i in range(c.encoder_layers):
            fwd = self.enc_rnns[i](x)
            if c.bidirectional:
                bwd = self.enc_rnns_rev[i](x, reverse=True, keep_order=True)
                x = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                x = fwd
        return x, pad

    def __call__(self, src_tokens, prev_output_tokens, deterministic: bool = True):
        c = self.cfg
        enc, enc_mask = self.encode_text(src_tokens, deterministic)
        y = self.tgt_embed(prev_output_tokens)
        y = self.dropout_layer(y, deterministic=deterministic)
        # stacked decoder LSTM (teacher forced) then per-position attention
        h = y
        for rnn in self.dec_rnns:
            h = rnn(h)
        if self.attn is not None:
            h = self.attn(h, enc, enc_mask)
        h = self.dropout_layer(h, deterministic=deterministic)
        if c.share_decoder_input_output_embed:
            return self.tgt_embed.attend(h)
        return self.output_projection(h).astype(jnp.float32)

    def forward_text_with_internal(self, src_tokens, prev_output_tokens,
                                   deterministic: bool = True):
        enc, _ = self.encode_text(src_tokens, deterministic)
        return self(src_tokens, prev_output_tokens, deterministic), enc


@register_model("lstm")
def build_lstm(cfg_dict: Dict, dtype=jnp.float32, param_dtype=jnp.float32):
    known = {f.name for f in dataclasses.fields(LSTMConfig)}
    cfg = LSTMConfig(**{k: v for k, v in cfg_dict.items() if k in known})
    return LSTMModel(cfg, dtype=dtype, param_dtype=param_dtype)


@register_model_architecture("lstm", "lstm")
def lstm_base(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("embed_dim", 512)
    d.setdefault("hidden_size", 512)
    return d


@register_model_architecture("lstm", "lstm_wiseman_iwslt_de_en")
def lstm_wiseman(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("embed_dim", 256)
    d.setdefault("hidden_size", 256)
    d.setdefault("dropout", 0.1)
    return d


@register_model_architecture("lstm", "lstm_luong_wmt_en_de")
def lstm_luong(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("embed_dim", 1000)
    d.setdefault("hidden_size", 1000)
    d.setdefault("encoder_layers", 4)
    d.setdefault("decoder_layers", 4)
    return d
