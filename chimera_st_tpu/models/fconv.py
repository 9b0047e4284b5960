"""Convolutional seq2seq (fconv).

reference: fairseq/models/fconv.py ("Convolutional Sequence to Sequence
Learning", Gehring et al. 2017): GLU conv stacks with residuals, per-decoder-
layer multi-step attention, sqrt(0.5) residual scaling, learned positions.
TPU-native: the convolutions are the same shifted-view XLA composition used
by the lightconv family (conv_attention._shifted_views) — dense MXU matmuls,
no im2col gathers.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.registry import register_model, register_model_architecture
from .conv_attention import _shifted_views
from .embedding import Embed

Dtype = Any
SQRT_HALF = math.sqrt(0.5)


@dataclass(frozen=True)
class FConvConfig:
    src_vocab_size: int = 8
    tgt_vocab_size: int = 8
    padding_idx: int = 1
    embed_dim: int = 512
    # (channels, kernel) per layer
    encoder_layers: Tuple[Tuple[int, int], ...] = ((512, 3),) * 20
    decoder_layers: Tuple[Tuple[int, int], ...] = ((512, 3),) * 20
    decoder_out_embed_dim: int = 256
    dropout: float = 0.1
    max_positions: int = 1024


class GLUConv(nn.Module):
    """Conv -> GLU over 2x channels (one layer of the fconv stack)."""

    out_channels: int
    kernel_size: int
    causal: bool
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        views = _shifted_views(x, self.kernel_size, self.causal)  # [B,T,K,C]
        B, T, K, C = views.shape
        y = nn.Dense(2 * self.out_channels, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="conv")(
            views.reshape(B, T, K * C)
        )
        a, b = jnp.split(y, 2, axis=-1)
        return a * jax.nn.sigmoid(b)


class FConvModel(nn.Module):
    cfg: FConvConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.src_embed = Embed(c.src_vocab_size, c.embed_dim,
                               padding_idx=c.padding_idx, name="src_embed", **common)
        self.tgt_embed = Embed(c.tgt_vocab_size, c.embed_dim,
                               padding_idx=c.padding_idx, name="tgt_embed", **common)
        self.src_pos = Embed(c.max_positions + c.padding_idx + 1, c.embed_dim,
                             padding_idx=c.padding_idx, name="src_pos", **common)
        self.tgt_pos = Embed(c.max_positions + c.padding_idx + 1, c.embed_dim,
                             padding_idx=c.padding_idx, name="tgt_pos", **common)

        enc_ch = [c.embed_dim] + [ch for ch, _ in c.encoder_layers]
        self.enc_proj_in = nn.Dense(enc_ch[1], name="enc_proj_in", **common)
        self.enc_convs = [
            GLUConv(ch, k, causal=False, name=f"enc_conv_{i}", **common)
            for i, (ch, k) in enumerate(c.encoder_layers)
        ]
        self.enc_proj_out = nn.Dense(c.embed_dim, name="enc_proj_out", **common)

        dec_ch = [c.embed_dim] + [ch for ch, _ in c.decoder_layers]
        self.dec_proj_in = nn.Dense(dec_ch[1], name="dec_proj_in", **common)
        self.dec_convs = [
            GLUConv(ch, k, causal=True, name=f"dec_conv_{i}", **common)
            for i, (ch, k) in enumerate(c.decoder_layers)
        ]
        # per-layer attention projections (multi-step attention)
        self.attn_q = [
            nn.Dense(c.embed_dim, name=f"attn_q_{i}", **common)
            for i in range(len(c.decoder_layers))
        ]
        self.attn_o = [
            nn.Dense(ch, name=f"attn_o_{i}", **common)
            for i, (ch, _) in enumerate(c.decoder_layers)
        ]
        self.dec_proj_out = nn.Dense(c.decoder_out_embed_dim, name="dec_proj_out", **common)
        self.out_proj = nn.Dense(c.tgt_vocab_size, name="out_proj", **common)
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
        # attention keys/values (reference: encoder returns (x, x + embed))
        keys = x
        values = (x + input_embed) * SQRT_HALF
        return (keys, values), pad

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
            # multi-step attention (reference: fconv.py AttentionLayer)
            q = (self.attn_q[i](y) + target_embed) * SQRT_HALF
            scores = jnp.einsum("btc,bsc->bts", q, keys)
            scores = jnp.where(enc_pad[:, None, :], -1e8, scores)
            w = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(y.dtype)
            ctx = jnp.einsum("bts,bsc->btc", w, values)
            # scale by sqrt(source length) (reference: fconv.py
            # AttentionLayer — x * (s * s.rsqrt()))
            s = jnp.sum(~enc_pad, axis=1, keepdims=True).astype(ctx.dtype)
            ctx = ctx * jnp.sqrt(jnp.maximum(s, 1.0))[:, :, None]
            y = y + self.attn_o[i](ctx)
            if y.shape[-1] == residual.shape[-1]:
                y = (y + residual) * SQRT_HALF
        y = self.dec_proj_out(y)
        y = self.dropout_layer(y, deterministic=deterministic)
        return self.out_proj(y).astype(jnp.float32)

    def forward_text_with_internal(self, src_tokens, prev_output_tokens,
                                   deterministic: bool = True):
        (keys, _), _ = self.encode_text(src_tokens, deterministic)
        return self(src_tokens, prev_output_tokens, deterministic), keys


@register_model("fconv")
def build_fconv(cfg_dict: Dict, dtype=jnp.float32, param_dtype=jnp.float32):
    known = {f.name for f in dataclasses.fields(FConvConfig)}
    kw = {k: v for k, v in cfg_dict.items() if k in known}
    for key in ("encoder_layers", "decoder_layers"):
        if key in kw and kw[key] and not isinstance(kw[key][0], tuple):
            kw[key] = tuple(tuple(x) for x in kw[key])
    cfg = FConvConfig(**kw)
    return FConvModel(cfg, dtype=dtype, param_dtype=param_dtype)


@register_model_architecture("fconv", "fconv")
def fconv_base(cfg: Dict) -> Dict:
    """Base preset = FConvConfig defaults (reference: fconv.py:699-716)."""
    return dict(cfg)


@register_model_architecture("fconv", "fconv_iwslt_de_en")
def fconv_iwslt(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("embed_dim", 256)
    d.setdefault("encoder_layers", ((256, 3),) * 4)
    d.setdefault("decoder_layers", ((256, 3),) * 3)
    d.setdefault("decoder_out_embed_dim", 256)
    return d


@register_model_architecture("fconv", "fconv_wmt_en_de")
def fconv_wmt_en_de(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("embed_dim", 768)
    d.setdefault("encoder_layers", ((512, 3),) * 9 + ((1024, 3),) * 4 + ((2048, 1),) * 2)
    d.setdefault("decoder_layers", ((512, 3),) * 9 + ((1024, 3),) * 4 + ((2048, 1),) * 2)
    d.setdefault("decoder_out_embed_dim", 512)
    return d


@dataclass(frozen=True)
class FConvLMConfig:
    vocab_size: int = 8
    padding_idx: int = 1
    embed_dim: int = 128
    layers: Tuple[Tuple[int, int], ...] = ((1268, 4),) * 13
    out_embed_dim: int = 128
    dropout: float = 0.1
    max_positions: int = 1024


class FConvLM(nn.Module):
    """Decoder-only convolutional LM (reference: fairseq/models/fconv_lm.py —
    the fconv decoder stack without attention)."""

    cfg: FConvLMConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.embed = Embed(c.vocab_size, c.embed_dim, padding_idx=c.padding_idx,
                           name="embed", **common)
        self.pos = Embed(c.max_positions + c.padding_idx + 1, c.embed_dim,
                         padding_idx=c.padding_idx, name="pos", **common)
        self.proj_in = nn.Dense(c.layers[0][0], name="proj_in", **common)
        self.convs = [
            GLUConv(ch, k, causal=True, name=f"conv_{i}", **common)
            for i, (ch, k) in enumerate(c.layers)
        ]
        self.proj_out = nn.Dense(c.out_embed_dim, name="proj_out", **common)
        self.out = nn.Dense(c.vocab_size, name="out", **common)
        self.dropout_layer = nn.Dropout(c.dropout)

    def features(self, tokens, deterministic: bool = True):
        """Pre-vocab hidden states [B, T, out_embed_dim] (used by the
        fconv_self_att pretrained-LM gating, reference: fconv_self_att.py)."""
        c = self.cfg
        nonpad = (tokens != c.padding_idx).astype(jnp.int32)
        pos_ids = jnp.cumsum(nonpad, axis=1) * nonpad + c.padding_idx
        x = self.embed(tokens) + self.pos(pos_ids)
        x = self.dropout_layer(x, deterministic=deterministic)
        x = self.proj_in(x)
        for conv in self.convs:
            residual = x
            x = conv(x)
            if x.shape[-1] == residual.shape[-1]:
                x = (x + residual) * SQRT_HALF
        return self.proj_out(x)

    def __call__(self, tokens, deterministic: bool = True):
        x = self.features(tokens, deterministic)
        x = self.dropout_layer(x, deterministic=deterministic)
        return self.out(x).astype(jnp.float32)


@register_model("fconv_lm")
def build_fconv_lm(cfg_dict: Dict, dtype=jnp.float32, param_dtype=jnp.float32):
    known = {f.name for f in dataclasses.fields(FConvLMConfig)}
    kw = {k: v for k, v in cfg_dict.items() if k in known}
    if "layers" in kw and kw["layers"] and not isinstance(kw["layers"][0], tuple):
        kw["layers"] = tuple(tuple(x) for x in kw["layers"])
    return FConvLM(FConvLMConfig(**kw), dtype=dtype, param_dtype=param_dtype)


@register_model_architecture("fconv_lm", "fconv_lm_dauphin_wikitext103")
def fconv_lm_wikitext(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("embed_dim", 280)
    d.setdefault("layers", ((850, 6),) * 3 + ((850, 1),) + ((850, 5),) * 4
                 + ((850, 1),) + ((850, 4),) * 3 + ((1024, 4),) + ((2048, 4),))
    d.setdefault("out_embed_dim", 280)
    return d


@register_model_architecture("fconv_lm", "fconv_lm")
def fconv_lm_base(cfg: Dict) -> Dict:
    return dict(cfg)


# reference arch-name parity (fairseq/models/fconv.py:720-756,
# fconv_lm.py:122-135)


@register_model_architecture("fconv", "fconv_wmt_en_ro")
def fconv_wmt_en_ro(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("decoder_out_embed_dim", 512)
    return d


@register_model_architecture("fconv", "fconv_wmt_en_fr")
def fconv_wmt_en_fr(cfg: Dict) -> Dict:
    d = dict(cfg)
    convs = ((512, 3),) * 6 + ((768, 3),) * 4 + ((1024, 3),) * 3 \
        + ((2048, 1),) + ((4096, 1),)
    d.setdefault("embed_dim", 768)
    d.setdefault("encoder_layers", convs)
    d.setdefault("decoder_layers", convs)
    d.setdefault("decoder_out_embed_dim", 512)
    return d


@register_model_architecture("fconv_lm", "fconv_lm_dauphin_gbw")
def fconv_lm_dauphin_gbw(cfg: Dict) -> Dict:
    """Dauphin GBW GCNN-13 (reference fconv_lm.py:122-135; its 3-tuples carry
    a residual-skip distance — this build's conv blocks use distance-1
    residuals throughout, so layers reduce to (channels, kernel) pairs)."""
    d = dict(cfg)
    layers = ((512, 5),) \
        + ((128, 1), (128, 5), (512, 1)) * 3 \
        + ((512, 1), (512, 5), (1024, 1)) * 3 \
        + ((1024, 1), (1024, 5), (2048, 1)) * 6 \
        + ((1024, 1), (1024, 5), (4096, 1))
    d.setdefault("embed_dim", 128)
    d.setdefault("layers", layers)
    return d
