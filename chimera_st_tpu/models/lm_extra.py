"""Model-zoo tail: decoder-only LM variants and tutorial models.

- lstm_lm    (reference: fairseq/models/lstm_lm.py:142 — LSTMModel's decoder
              run standalone, no attention / no encoder)
- lightconv_lm (reference: fairseq/models/lightconv_lm.py:306 — decoder-only
              lightweight/dynamic conv LM)
- simple_lstm (reference: fairseq/models/simple_lstm.py — the tutorial
              encoder-decoder LSTM without attention)
- rnn_classifier (reference: fairseq/models/rnn_classifier.py:121 — tiny RNN
              sequence classifier over tokens)

All decoder-only models expose the ``(tokens) -> logits [B, T, V]`` call the
language_modeling task / eval_lm CLI drive (same surface as TransformerLM /
FConvLM)."""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.registry import register_model, register_model_architecture
from .conv_attention import DynamicConv, LightweightConv
from .embedding import Embed
from .layers import LayerNorm, get_activation, positional_embedding_from_mask

Dtype = Any


# ------------------------------------------------------------------ lstm_lm


@dataclass(frozen=True)
class LSTMLMConfig:
    vocab_size: int = 8
    padding_idx: int = 1
    embed_dim: int = 512
    hidden_size: int = 512
    layers: int = 1
    dropout: float = 0.1
    share_input_output_embed: bool = False


class LSTMLM(nn.Module):
    cfg: LSTMLMConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.embed = Embed(c.vocab_size, c.embed_dim, padding_idx=c.padding_idx,
                           name="embed", **common)
        self.rnns = [
            nn.RNN(nn.OptimizedLSTMCell(c.hidden_size, **common), name=f"rnn_{i}")
            for i in range(c.layers)
        ]
        if c.hidden_size != c.embed_dim and c.share_input_output_embed:
            self.out_proj_dim = nn.Dense(c.embed_dim, name="out_proj_dim", **common)
        else:
            self.out_proj_dim = None
        if not c.share_input_output_embed:
            self.output_projection = nn.Dense(
                c.vocab_size, use_bias=False, name="output_projection", **common
            )
        self.dropout_layer = nn.Dropout(c.dropout)

    def __call__(self, tokens: jax.Array, deterministic: bool = True):
        """[B, T] -> logits [B, T, V]; causality comes from the recurrence."""
        c = self.cfg
        x = self.embed(tokens)
        x = self.dropout_layer(x, deterministic=deterministic)
        for rnn in self.rnns:
            x = rnn(x)
        x = self.dropout_layer(x, deterministic=deterministic)
        if c.share_input_output_embed:
            if self.out_proj_dim is not None:
                x = self.out_proj_dim(x)
            return self.embed.attend(x).astype(jnp.float32)
        return self.output_projection(x).astype(jnp.float32)


@register_model("lstm_lm")
def build_lstm_lm(cfg_dict: Dict, dtype=jnp.float32, param_dtype=jnp.float32):
    known = {f.name for f in dataclasses.fields(LSTMLMConfig)}
    cfg = LSTMLMConfig(**{k: v for k, v in cfg_dict.items() if k in known})
    return LSTMLM(cfg, dtype=dtype, param_dtype=param_dtype)


@register_model_architecture("lstm_lm", "lstm_lm")
def lstm_lm_base(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("embed_dim", 512)
    d.setdefault("hidden_size", 512)
    d.setdefault("layers", 1)
    return d


# -------------------------------------------------------------- lightconv_lm


@dataclass(frozen=True)
class LightConvLMConfig:
    vocab_size: int = 8
    padding_idx: int = 1
    embed_dim: int = 512
    ffn_dim: int = 2048
    layers: int = 6
    heads: int = 8
    kernel_sizes: Tuple[int, ...] = (3, 7, 15, 31, 31, 31)
    conv_type: str = "lightweight"  # or "dynamic"
    normalize_before: bool = True
    dropout: float = 0.1
    share_input_output_embed: bool = True


class LightConvLMLayer(nn.Module):
    """Causal GLU-conv block + FFN (the decoder layer minus encoder attention,
    reference: lightconv_lm.py builds LightConvDecoder with no_encoder_attn)."""

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
    def __call__(self, x, deterministic: bool = True):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ln1 = LayerNorm(self.dim, dtype=self.dtype, name="conv_layer_norm")
        ln2 = LayerNorm(self.dim, dtype=self.dtype, name="final_layer_norm")
        drop = nn.Dropout(self.dropout)

        residual = x
        if self.normalize_before:
            x = ln1(x)
        x = nn.Dense(2 * self.dim, name="linear1", **common)(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(b)
        conv_cls = (
            LightweightConv if self.conv_type == "lightweight" else DynamicConv
        )
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
        x = get_activation("relu")(nn.Dense(self.ffn_dim, name="fc1", **common)(x))
        x = nn.Dense(self.dim, name="fc2", **common)(x)
        x = drop(x, deterministic=deterministic)
        x = residual + x
        if not self.normalize_before:
            x = ln2(x)
        return x


class LightConvLM(nn.Module):
    cfg: LightConvLMConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.embed = Embed(c.vocab_size, c.embed_dim, padding_idx=c.padding_idx,
                           name="embed", **common)
        ks = c.kernel_sizes
        if len(ks) < c.layers:
            ks = ks + (ks[-1],) * (c.layers - len(ks))
        self.blocks = [
            LightConvLMLayer(
                c.embed_dim, c.ffn_dim, ks[i], c.heads, c.conv_type,
                dropout=c.dropout, normalize_before=c.normalize_before,
                name=f"layers_{i}", **common,
            )
            for i in range(c.layers)
        ]
        self.final_norm = LayerNorm(c.embed_dim, dtype=self.dtype, name="norm")
        if not c.share_input_output_embed:
            self.output_projection = nn.Dense(
                c.vocab_size, use_bias=False, name="output_projection", **common
            )
        self.embed_scale = math.sqrt(c.embed_dim)
        self.dropout_layer = nn.Dropout(c.dropout)

    def __call__(self, tokens: jax.Array, deterministic: bool = True):
        c = self.cfg
        pad = tokens == c.padding_idx
        x = self.embed_scale * self.embed(tokens)
        x = x + positional_embedding_from_mask(
            pad, c.embed_dim, c.padding_idx
        ).astype(x.dtype)
        x = self.dropout_layer(x, deterministic=deterministic)
        for block in self.blocks:
            x = block(x, deterministic=deterministic)
        if c.normalize_before:
            x = self.final_norm(x)
        if c.share_input_output_embed:
            return self.embed.attend(x).astype(jnp.float32)
        return self.output_projection(x).astype(jnp.float32)


@register_model("lightconv_lm")
def build_lightconv_lm(cfg_dict: Dict, dtype=jnp.float32, param_dtype=jnp.float32):
    known = {f.name for f in dataclasses.fields(LightConvLMConfig)}
    d = {k: v for k, v in cfg_dict.items() if k in known}
    if "kernel_sizes" in d:
        d["kernel_sizes"] = tuple(d["kernel_sizes"])
    return LightConvLM(LightConvLMConfig(**d), dtype=dtype, param_dtype=param_dtype)


@register_model_architecture("lightconv_lm", "lightconv_lm")
def lightconv_lm_base(cfg: Dict) -> Dict:
    return dict(cfg)


@register_model_architecture("lightconv_lm", "dynamicconv_lm")
def dynamicconv_lm(cfg: Dict) -> Dict:
    d = dict(cfg)
    d["conv_type"] = "dynamic"
    return d


# -------------------------------------------------------------- simple_lstm


@register_model("simple_lstm")
def build_simple_lstm(cfg_dict: Dict, dtype=jnp.float32, param_dtype=jnp.float32):
    """Tutorial encoder-decoder LSTM without attention
    (reference: fairseq/models/simple_lstm.py) — the LSTM model family with
    the attention layer disabled."""
    from .lstm import LSTMConfig, LSTMModel

    known = {f.name for f in dataclasses.fields(LSTMConfig)}
    d = {k: v for k, v in cfg_dict.items() if k in known}
    d["attention"] = False
    return LSTMModel(LSTMConfig(**d), dtype=dtype, param_dtype=param_dtype)


@register_model_architecture("simple_lstm", "simple_lstm")
def simple_lstm_arch(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("embed_dim", 256)
    d.setdefault("hidden_size", 256)
    return d


# ----------------------------------------------------------- rnn_classifier


@dataclass(frozen=True)
class RNNClassifierConfig:
    vocab_size: int = 8
    num_classes: int = 2
    padding_idx: int = 1
    embed_dim: int = 128
    hidden_size: int = 128
    dropout: float = 0.0


class RNNClassifier(nn.Module):
    """Token sequence -> class log-probs via the final RNN state
    (reference: fairseq/models/rnn_classifier.py:121 — the tutorial toy)."""

    cfg: RNNClassifierConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array, deterministic: bool = True):
        c = self.cfg
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = Embed(c.vocab_size, c.embed_dim, padding_idx=c.padding_idx,
                  name="embed", **common)(tokens)
        x = nn.Dropout(c.dropout)(x, deterministic=deterministic)
        h = nn.RNN(nn.GRUCell(c.hidden_size, **common), name="rnn")(x)
        # last non-pad state per sequence
        lengths = jnp.sum((tokens != c.padding_idx).astype(jnp.int32), axis=1)
        idx = jnp.maximum(lengths - 1, 0)
        last = jnp.take_along_axis(h, idx[:, None, None], axis=1)[:, 0]
        logits = nn.Dense(c.num_classes, name="classifier", **common)(last)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


@register_model("rnn_classifier")
def build_rnn_classifier(cfg_dict: Dict, dtype=jnp.float32, param_dtype=jnp.float32):
    known = {f.name for f in dataclasses.fields(RNNClassifierConfig)}
    cfg = RNNClassifierConfig(**{k: v for k, v in cfg_dict.items() if k in known})
    return RNNClassifier(cfg, dtype=dtype, param_dtype=param_dtype)


@register_model_architecture("rnn_classifier", "rnn_classifier")
def rnn_classifier_arch(cfg: Dict) -> Dict:
    return dict(cfg)


@register_model_architecture("lightconv_lm", "lightconv_lm_gbw")
def lightconv_lm_gbw(cfg: Dict) -> Dict:
    """reference: lightconv_lm.py:299-306."""
    d = dict(cfg)
    d.setdefault("embed_dim", 512)
    d.setdefault("ffn_dim", 4096)
    d.setdefault("heads", 16)
    d.setdefault("dropout", 0.1)
    return lightconv_lm_base(d)


@register_model_architecture("rnn_classifier", "pytorch_tutorial_rnn")
def pytorch_tutorial_rnn(cfg: Dict) -> Dict:
    """reference arch name (models/rnn_classifier.py:133)."""
    return dict(cfg)


@register_model_architecture("simple_lstm", "tutorial_simple_lstm")
def tutorial_simple_lstm(cfg: Dict) -> Dict:
    """reference arch name (models/simple_lstm.py)."""
    return dict(cfg)


# ------------------------------------------------------------- dummy_model


@dataclass(frozen=True)
class DummyModelConfig:
    vocab_size: int = 8
    padding_idx: int = 1
    embed_dim: int = 1024
    layers: int = 24
    dropout: float = 0.1


class DummyModel(nn.Module):
    """Throughput-benchmark LM with transformer-shaped FLOPs but no attention
    (reference: fairseq/benchmark/dummy_model.py:17-91 — per layer, a residual
    qkv/out-projection stack and a residual 4x FFN; paired with the dummy_*
    tasks it measures the compiled step in isolation)."""

    cfg: DummyModelConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array, deterministic: bool = True):
        c = self.cfg
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = Embed(c.vocab_size, c.embed_dim, padding_idx=c.padding_idx,
                  name="embed", **common)(tokens)
        for i in range(c.layers):
            h = LayerNorm(c.embed_dim, dtype=self.dtype, name=f"attn_ln_{i}")(x)
            h = nn.Dense(3 * c.embed_dim, name=f"qkv_{i}", **common)(h)
            h = nn.Dense(c.embed_dim, name=f"attn_skip_{i}", **common)(h)
            h = nn.Dense(c.embed_dim, name=f"attn_out_{i}", **common)(h)
            h = nn.Dropout(c.dropout)(h, deterministic=deterministic)
            x = x + h
            h = LayerNorm(c.embed_dim, dtype=self.dtype, name=f"ffn_ln_{i}")(x)
            h = nn.relu(nn.Dense(4 * c.embed_dim, name=f"ffn_up_{i}", **common)(h))
            h = nn.Dense(c.embed_dim, name=f"ffn_down_{i}", **common)(h)
            h = nn.Dropout(c.dropout)(h, deterministic=deterministic)
            x = x + h
        logits = nn.Dense(c.vocab_size, name="out_proj", **common)(x)
        return logits.astype(jnp.float32)


@register_model("dummy_model")
def build_dummy_model(cfg_dict: Dict, dtype=jnp.float32, param_dtype=jnp.float32):
    known = {f.name for f in dataclasses.fields(DummyModelConfig)}
    d = dict(cfg_dict)
    d.setdefault("vocab_size", d.pop("tgt_vocab_size", 8))
    cfg = DummyModelConfig(**{k: v for k, v in d.items() if k in known})
    return DummyModel(cfg, dtype=dtype, param_dtype=param_dtype)


@register_model_architecture("dummy_model", "dummy_model")
def dummy_model_arch(cfg: Dict) -> Dict:
    return dict(cfg)
