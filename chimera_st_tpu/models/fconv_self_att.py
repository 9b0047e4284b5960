"""Convolutional seq2seq with decoder self-attention (+ optional pretrained
LM gating).

reference: fairseq/models/fconv_self_att.py:1-674 FConvModelSelfAtt — the
stories-generation model: fconv encoder, conv decoder whose layers carry
(a) gated encoder attention and (b) downsampled multi-head SELF-attention,
plus an optional composite mode where a pretrained conv LM's states are
gated into the decoder output. Per-layer attention placement follows the
reference's list-valued ``--encoder-attention`` / ``--self-attention`` flags.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.registry import register_model, register_model_architecture
from .embedding import Embed
from .fconv import GLUConv, SQRT_HALF

Dtype = Any


def _parse_flags(spec, n: int) -> Tuple[bool, ...]:
    """'True' | 'False' | [bool,...] -> per-layer tuple (reference:
    fconv_self_att.py eval(args.self_attention) expanded to layer count)."""
    if isinstance(spec, (list, tuple)):
        vals = list(spec)
    elif isinstance(spec, str):
        vals = [spec.strip().lower() == "true"]
    else:
        vals = [bool(spec)]
    if len(vals) == 1:
        vals = vals * n
    assert len(vals) == n, (vals, n)
    return tuple(bool(v) for v in vals)


@dataclass(frozen=True)
class FConvSelfAttConfig:
    src_vocab_size: int = 8
    tgt_vocab_size: int = 8
    padding_idx: int = 1
    embed_dim: int = 512
    encoder_layers: Tuple[Tuple[int, int], ...] = ((512, 3),) * 3
    decoder_layers: Tuple[Tuple[int, int], ...] = ((512, 3),) * 8
    decoder_out_embed_dim: int = 256
    self_attention: Any = False  # bool or per-layer list
    encoder_attention: Any = True
    self_attention_heads: int = 1
    downsample: int = 1  # k/v stride in self-attention (reference: Downsample)
    dropout: float = 0.1
    max_positions: int = 1024
    # composite mode: gate a pretrained conv-LM's states into the output
    # (reference: fconv_self_att.py 'pretrained' arch + gated_loss path)
    pretrained_lm: bool = False


class DownsampledSelfAttention(nn.Module):
    """Causal multi-head self-attention with optionally strided keys/values
    (reference: fconv_self_att.py SelfAttention + Downsample — the stories
    model attends over every ``downsample``-th state to cut cost)."""

    embed_dim: int
    heads: int = 1
    downsample: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, T, C]
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        B, T, C = x.shape
        H = self.heads
        D = self.embed_dim // H
        q = nn.Dense(self.embed_dim, name="q_proj", **common)(x)
        kv_src = x[:, :: self.downsample, :] if self.downsample > 1 else x
        k = nn.Dense(self.embed_dim, name="k_proj", **common)(kv_src)
        v = nn.Dense(self.embed_dim, name="v_proj", **common)(kv_src)
        S = k.shape[1]
        qh = q.reshape(B, T, H, D)
        kh = k.reshape(B, S, H, D)
        vh = v.reshape(B, S, H, D)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
        ) / jnp.float32(math.sqrt(D))
        # causal w.r.t. ORIGINAL positions: key j covers position j*downsample
        qi = jax.lax.broadcasted_iota(jnp.int32, (T, S), 0)
        ki = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1) * self.downsample
        logits = jnp.where(ki > qi, -1e8, logits)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(B, T, C)
        return nn.Dense(self.embed_dim, name="out_proj", **common)(out)


class FConvSelfAttModel(nn.Module):
    cfg: FConvSelfAttConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        n_dec = len(c.decoder_layers)
        self.enc_attn_flags = _parse_flags(c.encoder_attention, n_dec)
        self.self_attn_flags = _parse_flags(c.self_attention, n_dec)

        self.src_embed = Embed(c.src_vocab_size, c.embed_dim,
                               padding_idx=c.padding_idx, name="src_embed", **common)
        self.tgt_embed = Embed(c.tgt_vocab_size, c.embed_dim,
                               padding_idx=c.padding_idx, name="tgt_embed", **common)
        self.src_pos = Embed(c.max_positions + c.padding_idx + 1, c.embed_dim,
                             padding_idx=c.padding_idx, name="src_pos", **common)
        self.tgt_pos = Embed(c.max_positions + c.padding_idx + 1, c.embed_dim,
                             padding_idx=c.padding_idx, name="tgt_pos", **common)

        self.enc_proj_in = nn.Dense(c.encoder_layers[0][0], name="enc_proj_in",
                                    **common)
        self.enc_convs = [
            GLUConv(ch, k, causal=False, name=f"enc_conv_{i}", **common)
            for i, (ch, k) in enumerate(c.encoder_layers)
        ]
        self.enc_proj_out = nn.Dense(c.embed_dim, name="enc_proj_out", **common)

        self.dec_proj_in = nn.Dense(c.decoder_layers[0][0], name="dec_proj_in",
                                    **common)
        self.dec_convs = [
            GLUConv(ch, k, causal=True, name=f"dec_conv_{i}", **common)
            for i, (ch, k) in enumerate(c.decoder_layers)
        ]
        self.attn_q = [
            nn.Dense(c.embed_dim, name=f"attn_q_{i}", **common)
            if self.enc_attn_flags[i] else None
            for i in range(n_dec)
        ]
        self.attn_o = [
            nn.Dense(ch, name=f"attn_o_{i}", **common)
            if self.enc_attn_flags[i] else None
            for i, (ch, _) in enumerate(c.decoder_layers)
        ]
        # gated encoder attention (reference: project + sigmoid gate)
        self.attn_gate = [
            nn.Dense(ch, name=f"attn_gate_{i}", **common)
            if self.enc_attn_flags[i] else None
            for i, (ch, _) in enumerate(c.decoder_layers)
        ]
        self.self_attn = [
            DownsampledSelfAttention(
                ch, heads=c.self_attention_heads, downsample=c.downsample,
                name=f"self_attn_{i}", **common,
            )
            if self.self_attn_flags[i] else None
            for i, (ch, _) in enumerate(c.decoder_layers)
        ]
        self.dec_proj_out = nn.Dense(c.decoder_out_embed_dim,
                                     name="dec_proj_out", **common)
        self.out_proj = nn.Dense(c.tgt_vocab_size, name="out_proj", **common)
        if c.pretrained_lm:
            from .fconv import FConvLM, FConvLMConfig

            self.pretrained = FConvLM(
                FConvLMConfig(
                    vocab_size=c.tgt_vocab_size,
                    padding_idx=c.padding_idx,
                    embed_dim=c.embed_dim,
                ),
                name="pretrained",
                **common,
            )
            self.gate1 = nn.Dense(c.decoder_out_embed_dim, name="gate1", **common)
            self.gate2 = nn.Dense(c.decoder_out_embed_dim, name="gate2", **common)
            self.lm_proj = nn.Dense(c.decoder_out_embed_dim, name="lm_proj",
                                    **common)
        self.dropout_layer = nn.Dropout(c.dropout)

    def _positions(self, tokens):
        nonpad = (tokens != self.cfg.padding_idx).astype(jnp.int32)
        return jnp.cumsum(nonpad, axis=1) * nonpad + self.cfg.padding_idx

    def encode_text(self, src_tokens, deterministic: bool = True):
        c = self.cfg
        pad = src_tokens == c.padding_idx
        x = self.src_embed(src_tokens) + self.src_pos(self._positions(src_tokens))
        x = self.dropout_layer(x, deterministic=deterministic)
        input_embed = x
        x = self.enc_proj_in(x)
        for conv in self.enc_convs:
            residual = x
            x = jnp.where(pad[:, :, None], 0.0, x)
            x = conv(x)
            if x.shape[-1] == residual.shape[-1]:
                x = (x + residual) * SQRT_HALF
        x = self.enc_proj_out(x)
        return (x, (x + input_embed) * SQRT_HALF), pad

    def __call__(self, src_tokens, prev_output_tokens, deterministic: bool = True):
        c = self.cfg
        (keys, values), enc_pad = self.encode_text(src_tokens, deterministic)
        y = self.tgt_embed(prev_output_tokens) + self.tgt_pos(
            self._positions(prev_output_tokens)
        )
        y = self.dropout_layer(y, deterministic=deterministic)
        target_embed = y
        y = self.dec_proj_in(y)
        for i, conv in enumerate(self.dec_convs):
            residual = y
            y = conv(y)
            if self.enc_attn_flags[i]:
                q = (self.attn_q[i](y) + target_embed) * SQRT_HALF
                scores = jnp.einsum("btc,bsc->bts", q, keys)
                scores = jnp.where(enc_pad[:, None, :], -1e8, scores)
                w = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(y.dtype)
                ctx = jnp.einsum("bts,bsc->btc", w, values)
                s = jnp.sum(~enc_pad, axis=1, keepdims=True).astype(ctx.dtype)
                ctx = ctx * jnp.sqrt(jnp.maximum(s, 1.0))[:, :, None]
                attn_out = self.attn_o[i](ctx)
                gate = jax.nn.sigmoid(self.attn_gate[i](ctx))
                y = y + gate * attn_out
            if self.self_attn_flags[i]:
                y = y + self.self_attn[i](y)
            if y.shape[-1] == residual.shape[-1]:
                y = (y + residual) * SQRT_HALF
        y = self.dec_proj_out(y)
        y = self.dropout_layer(y, deterministic=deterministic)
        if c.pretrained_lm:
            # gated fusion with the pretrained LM's features (reference:
            # fconv_self_att.py forward — sigmoid gates over [dec; lm])
            lm_feat = self.pretrained.features(
                prev_output_tokens, deterministic=deterministic
            )
            lm_feat = self.lm_proj(lm_feat)
            both = jnp.concatenate([y, lm_feat], axis=-1)
            g1 = jax.nn.sigmoid(self.gate1(both))
            g2 = jax.nn.sigmoid(self.gate2(both))
            y = g1 * y + g2 * lm_feat
        return self.out_proj(y).astype(jnp.float32)

    def forward_text_with_internal(self, src_tokens, prev_output_tokens,
                                   deterministic: bool = True):
        (keys, _), _ = self.encode_text(src_tokens, deterministic)
        return self(src_tokens, prev_output_tokens, deterministic), keys


@register_model("fconv_self_att")
def build_fconv_self_att(cfg_dict: Dict, dtype=jnp.float32, param_dtype=jnp.float32):
    known = {f.name for f in dataclasses.fields(FConvSelfAttConfig)}
    kw = {k: v for k, v in cfg_dict.items() if k in known}
    for key in ("encoder_layers", "decoder_layers"):
        if key in kw:
            kw[key] = tuple(tuple(x) for x in kw[key])
    return FConvSelfAttModel(FConvSelfAttConfig(**kw), dtype=dtype,
                             param_dtype=param_dtype)


@register_model_architecture("fconv_self_att", "fconv_self_att")
def fconv_self_att_arch(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("self_attention", True)
    return d


@register_model_architecture("fconv_self_att", "fconv_self_att_wp")
def fconv_self_att_wp(cfg: Dict) -> Dict:
    """Stories writing-prompts preset (reference: fconv_self_att.py
    fconv_self_att_wp architecture, downsampled single-head attention)."""
    d = dict(cfg)
    d.setdefault("embed_dim", 256)
    d.setdefault("encoder_layers", ((128, 3),) * 2 + ((512, 3),) * 1)
    d.setdefault("decoder_layers", ((512, 4),) * 4 + ((768, 4),) * 2)
    d.setdefault("decoder_out_embed_dim", 256)
    d.setdefault("self_attention", True)
    d.setdefault("self_attention_heads", 1)
    d.setdefault("downsample", 2)
    return d
