"""LightConv / DynamicConv MT model assembly.

reference: fairseq/models/lightconv.py ("Pay Less Attention with Lightweight
and Dynamic Convolutions") — encoder stacks conv blocks, decoder stacks
causal conv blocks with standard encoder-decoder attention. The conv blocks
are the XLA-composed LightweightConv/DynamicConv from conv_attention.py
(replacing the reference's CUDA kernels).
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
from .conv_attention import ConvAttentionLayer, DynamicConv, LightweightConv
from .embedding import Embed
from .layers import (
    LayerNorm,
    MultiheadAttention,
    get_activation,
    positional_embedding_from_mask,
)

Dtype = Any


@dataclass(frozen=True)
class LightConvMTConfig:
    src_vocab_size: int = 8
    tgt_vocab_size: int = 8
    padding_idx: int = 1
    embed_dim: int = 512
    ffn_dim: int = 2048
    encoder_layers: int = 7
    decoder_layers: int = 6
    heads: int = 8
    conv_type: str = "lightweight"  # or "dynamic"
    # per-layer kernel sizes (reference defaults: 3,7,15,31x4 enc / 3,7,15,31x3 dec)
    encoder_kernel_sizes: Tuple[int, ...] = (3, 7, 15, 31, 31, 31, 31)
    decoder_kernel_sizes: Tuple[int, ...] = (3, 7, 15, 31, 31, 31)
    dropout: float = 0.1
    share_decoder_input_output_embed: bool = True
    normalize_before: bool = True


class LightConvDecoderLayer(nn.Module):
    """Causal conv block + encoder attention + FFN
    (reference: lightconv.py LightConvDecoderLayer)."""

    dim: int
    ffn_dim: int
    kernel_size: int
    heads: int
    conv_type: str
    dropout: float = 0.1
    normalize_before: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, enc, enc_mask, self_pad_mask=None, deterministic=True):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ln1 = LayerNorm(self.dim, dtype=self.dtype, name="conv_layer_norm")
        ln2 = LayerNorm(self.dim, dtype=self.dtype, name="encoder_attn_layer_norm")
        ln3 = LayerNorm(self.dim, dtype=self.dtype, name="final_layer_norm")
        drop = nn.Dropout(self.dropout)

        residual = x
        if self.normalize_before:
            x = ln1(x)
        x = nn.Dense(2 * self.dim, name="linear1", **common)(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(b)
        conv_cls = LightweightConv if self.conv_type == "lightweight" else DynamicConv
        x = conv_cls(self.dim, self.kernel_size, self.heads, causal=True,
                     name="conv", **common)(x, deterministic=deterministic)
        x = nn.Dense(self.dim, name="linear2", **common)(x)
        x = drop(x, deterministic=deterministic)
        x = residual + x
        if not self.normalize_before:
            x = ln1(x)

        residual = x
        if self.normalize_before:
            x = ln2(x)
        x, _ = MultiheadAttention(self.dim, self.heads, name="encoder_attn",
                                  **common)(x, kv=enc, key_padding_mask=enc_mask,
                                            deterministic=deterministic)
        x = drop(x, deterministic=deterministic)
        x = residual + x
        if not self.normalize_before:
            x = ln2(x)

        residual = x
        if self.normalize_before:
            x = ln3(x)
        x = get_activation("relu")(nn.Dense(self.ffn_dim, name="fc1", **common)(x))
        x = nn.Dense(self.dim, name="fc2", **common)(x)
        x = drop(x, deterministic=deterministic)
        x = residual + x
        if not self.normalize_before:
            x = ln3(x)
        return x


class LightConvModel(nn.Module):
    cfg: LightConvMTConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.embed_tokens = Embed(c.src_vocab_size, c.embed_dim,
                                  padding_idx=c.padding_idx,
                                  name="embed_tokens", **common)
        self.tgt_embed_tokens = Embed(c.tgt_vocab_size, c.embed_dim,
                                      padding_idx=c.padding_idx,
                                      name="tgt_embed_tokens", **common)
        self.enc_layers = [
            ConvAttentionLayer(
                c.embed_dim, c.ffn_dim, c.encoder_kernel_sizes[i], c.heads,
                conv_type=c.conv_type, causal=False, dropout=c.dropout,
                normalize_before=c.normalize_before, name=f"enc_{i}", **common,
            )
            for i in range(c.encoder_layers)
        ]
        self.dec_layers = [
            LightConvDecoderLayer(
                c.embed_dim, c.ffn_dim, c.decoder_kernel_sizes[i], c.heads,
                c.conv_type, dropout=c.dropout,
                normalize_before=c.normalize_before, name=f"dec_{i}", **common,
            )
            for i in range(c.decoder_layers)
        ]
        self.enc_norm = LayerNorm(c.embed_dim, dtype=self.dtype, name="enc_norm")
        self.dec_norm = LayerNorm(c.embed_dim, dtype=self.dtype, name="dec_norm")
        if not c.share_decoder_input_output_embed:
            self.output_projection = nn.Dense(c.tgt_vocab_size, use_bias=False,
                                              name="output_projection", **common)
        self.embed_scale = math.sqrt(c.embed_dim)
        self.dropout_layer = nn.Dropout(c.dropout)

    def encode_text(self, src_tokens, deterministic: bool = True):
        c = self.cfg
        pad = src_tokens == c.padding_idx
        x = self.embed_scale * self.embed_tokens(src_tokens)
        x = x + positional_embedding_from_mask(pad, c.embed_dim, c.padding_idx).astype(x.dtype)
        x = self.dropout_layer(x, deterministic=deterministic)
        for layer in self.enc_layers:
            x = layer(x, padding_mask=pad, deterministic=deterministic)
        if c.normalize_before:
            x = self.enc_norm(x)
        return x, pad

    def __call__(self, src_tokens, prev_output_tokens, deterministic: bool = True):
        c = self.cfg
        enc, enc_mask = self.encode_text(src_tokens, deterministic)
        pad = prev_output_tokens == c.padding_idx
        x = self.embed_scale * self.tgt_embed_tokens(prev_output_tokens)
        x = x + positional_embedding_from_mask(pad, c.embed_dim, c.padding_idx).astype(x.dtype)
        x = self.dropout_layer(x, deterministic=deterministic)
        for layer in self.dec_layers:
            x = layer(x, enc, enc_mask, self_pad_mask=pad,
                      deterministic=deterministic)
        if c.normalize_before:
            x = self.dec_norm(x)
        if c.share_decoder_input_output_embed:
            return self.tgt_embed_tokens.attend(x)
        return self.output_projection(x)

    def forward_text_with_internal(self, src_tokens, prev_output_tokens,
                                   deterministic: bool = True):
        enc, _ = self.encode_text(src_tokens, deterministic)
        return self(src_tokens, prev_output_tokens, deterministic), enc


@register_model("lightconv")
def build_lightconv(cfg_dict: Dict, dtype=jnp.float32, param_dtype=jnp.float32):
    known = {f.name for f in dataclasses.fields(LightConvMTConfig)}
    kw = {k: v for k, v in cfg_dict.items() if k in known}
    for key in ("encoder_kernel_sizes", "decoder_kernel_sizes"):
        if key in kw and not isinstance(kw[key], tuple):
            kw[key] = tuple(kw[key])
    # fit per-layer kernel lists to the layer counts
    kw["encoder_kernel_sizes"] = _fit(
        kw.get("encoder_kernel_sizes", (3, 7, 15, 31, 31, 31, 31)),
        kw.get("encoder_layers", 7),
    )
    kw["decoder_kernel_sizes"] = _fit(
        kw.get("decoder_kernel_sizes", (3, 7, 15, 31, 31, 31)),
        kw.get("decoder_layers", 6),
    )
    cfg = LightConvMTConfig(**kw)
    return LightConvModel(cfg, dtype=dtype, param_dtype=param_dtype)


def _fit(ks: Tuple[int, ...], n: int) -> Tuple[int, ...]:
    ks = tuple(ks)
    if len(ks) >= n:
        return ks[:n]
    return ks + (ks[-1],) * (n - len(ks))


@register_model_architecture("lightconv", "lightconv_iwslt_de_en")
def lightconv_iwslt(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("embed_dim", 512)
    d.setdefault("ffn_dim", 1024)
    d.setdefault("encoder_layers", 7)
    d.setdefault("decoder_layers", 6)
    d.setdefault("heads", 4)
    d.setdefault("conv_type", "lightweight")
    return d


@register_model_architecture("lightconv", "dynamicconv_iwslt_de_en")
def dynamicconv_iwslt(cfg: Dict) -> Dict:
    d = lightconv_iwslt(cfg)
    d["conv_type"] = "dynamic"
    return d


# reference arch-name parity (fairseq/models/lightconv.py:984-1018)


@register_model_architecture("lightconv", "lightconv")
@register_model_architecture("lightconv", "lightconv_wmt_en_de")
def lightconv_wmt_en_de(cfg: Dict) -> Dict:
    return dict(cfg)


@register_model_architecture("lightconv", "lightconv_wmt_en_de_big")
def lightconv_wmt_en_de_big(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("embed_dim", 1024)
    d.setdefault("ffn_dim", 4096)
    d.setdefault("heads", 16)
    d.setdefault("dropout", 0.3)
    return d


@register_model_architecture("lightconv", "lightconv_wmt_en_fr_big")
def lightconv_wmt_en_fr_big(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("dropout", 0.1)
    return lightconv_wmt_en_de_big(d)


@register_model_architecture("lightconv", "lightconv_wmt_zh_en_big")
def lightconv_wmt_zh_en_big(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("dropout", 0.2)
    return lightconv_wmt_en_de_big(d)
