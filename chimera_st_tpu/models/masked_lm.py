"""Bidirectional masked-LM encoder model (RoBERTa-style).

reference: fairseq/models/masked_lm.py + fairseq/models/roberta/ — a
transformer encoder with a tied-embedding LM head over masked positions.
Reuses the shared encoder stack; the LM head is the fairseq roberta head
(dense -> activation -> layer-norm -> tied projection + bias)."""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.registry import register_model, register_model_architecture
from .embedding import Embed
from .layers import (
    LayerNorm,
    TransformerEncoderLayer,
    get_activation,
    positional_embedding_from_mask,
)

Dtype = Any


@dataclass(frozen=True)
class MaskedLMConfig:
    vocab_size: int = 8
    padding_idx: int = 1
    embed_dim: int = 768
    ffn_dim: int = 3072
    layers: int = 12
    heads: int = 12
    normalize_before: bool = False  # roberta/bert: post-norm
    activation: str = "gelu"
    dropout: float = 0.1
    max_positions: int = 512
    # >0: next-sentence-prediction head over the pooled first token
    # (reference: masked_lm.py --sent-loss / sentence_class_num)
    sentence_class_num: int = 0


class MaskedLMModel(nn.Module):
    cfg: MaskedLMConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.embed_tokens = Embed(
            c.vocab_size, c.embed_dim, padding_idx=c.padding_idx,
            name="embed_tokens", **common,
        )
        self.emb_layer_norm = LayerNorm(c.embed_dim, dtype=self.dtype,
                                        name="emb_layer_norm")
        self.layers_list = [
            TransformerEncoderLayer(
                c.embed_dim, c.ffn_dim, c.heads,
                dropout=c.dropout, attention_dropout=c.dropout,
                activation_dropout=0.0, activation=c.activation,
                normalize_before=c.normalize_before,
                name=f"layers_{i}", **common,
            )
            for i in range(c.layers)
        ]
        # roberta lm head
        self.lm_head_dense = nn.Dense(c.embed_dim, name="lm_head_dense", **common)
        self.lm_head_layer_norm = LayerNorm(
            c.embed_dim, dtype=self.dtype, name="lm_head_layer_norm"
        )
        self.lm_head_bias = self.param(
            "lm_head_bias", nn.initializers.zeros, (c.vocab_size,), self.param_dtype
        )
        if c.sentence_class_num > 0:
            self.sentence_projection = nn.Dense(
                c.sentence_class_num, name="sentence_projection", **common
            )
        self.dropout_layer = nn.Dropout(c.dropout)

    def encode(self, tokens: jax.Array, deterministic: bool = True):
        c = self.cfg
        pad_mask = tokens == c.padding_idx
        x = self.embed_tokens(tokens)
        pos = positional_embedding_from_mask(pad_mask, c.embed_dim, c.padding_idx)
        x = x + pos.astype(x.dtype)
        x = self.emb_layer_norm(x)
        x = self.dropout_layer(x, deterministic=deterministic)
        for layer in self.layers_list:
            x = layer(x, encoder_padding_mask=pad_mask, deterministic=deterministic)
        return x, pad_mask

    def __call__(self, tokens: jax.Array, deterministic: bool = True):
        """[B, T] -> masked-LM logits [B, T, V]."""
        x, _ = self.encode(tokens, deterministic)
        act = get_activation(self.cfg.activation)
        x = self.lm_head_layer_norm(act(self.lm_head_dense(x)))
        logits = self.embed_tokens.attend(x) + self.lm_head_bias.astype(jnp.float32)
        if self.cfg.sentence_class_num > 0 and self.is_initializing():
            # touch the NSP head only at init so flax materializes its params
            self.sentence_projection(x[:, :1, :][:, 0])
        return logits

    def classify_sentence(self, tokens: jax.Array, deterministic: bool = True):
        """Next-sentence logits [B, C] from the pooled first-token state
        (reference: masked_lm.py sentence_projection_layer)."""
        x, _ = self.encode(tokens, deterministic)
        return self.sentence_projection(x[:, 0]).astype(jnp.float32)

    def forward_with_sentence(self, tokens: jax.Array,
                              deterministic: bool = True):
        """One encoder pass -> (mlm logits [B, T, V], nsp logits [B, C]).
        The legacy_masked_lm criterion uses this instead of two separate
        apply calls (review fix: the NSP head re-ran the whole encoder,
        doubling step FLOPs)."""
        x, _ = self.encode(tokens, deterministic)
        act = get_activation(self.cfg.activation)
        h = self.lm_head_layer_norm(act(self.lm_head_dense(x)))
        logits = self.embed_tokens.attend(h) + self.lm_head_bias.astype(
            jnp.float32
        )
        sent = self.sentence_projection(x[:, 0]).astype(jnp.float32)
        return logits, sent


@register_model("masked_lm")
def build_masked_lm(cfg_dict: Dict, dtype=jnp.float32, param_dtype=jnp.float32):
    known = {f.name for f in dataclasses.fields(MaskedLMConfig)}
    d = dict(cfg_dict)
    d.setdefault("vocab_size", d.pop("tgt_vocab_size", 8))
    cfg = MaskedLMConfig(**{k: v for k, v in d.items() if k in known})
    return MaskedLMModel(cfg, dtype=dtype, param_dtype=param_dtype)


@register_model_architecture("masked_lm", "roberta_base")
def roberta_base(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("embed_dim", 768)
    d.setdefault("ffn_dim", 3072)
    d.setdefault("layers", 12)
    d.setdefault("heads", 12)
    return d


@register_model_architecture("masked_lm", "roberta_large")
def roberta_large(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("embed_dim", 1024)
    d.setdefault("ffn_dim", 4096)
    d.setdefault("layers", 24)
    d.setdefault("heads", 16)
    return d


# reference name aliases: roberta is the masked-LM encoder under a hub
# surface (reference models/roberta/model.py:31 register_model("roberta");
# camembert/xlmr differ only in their pretrained tokenizers —
# model_camembert.py:15, model_xlmr.py:15)
register_model("roberta")(build_masked_lm)


@register_model_architecture("roberta", "roberta")
def roberta_arch(cfg: Dict) -> Dict:
    return roberta_base(cfg)


@register_model_architecture("roberta", "camembert")
def camembert_arch(cfg: Dict) -> Dict:
    return roberta_base(cfg)


@register_model_architecture("roberta", "xlmr")
def xlmr_arch(cfg: Dict) -> Dict:
    return roberta_large(cfg)


@register_model_architecture("roberta", "xlm")
def xlm_arch(cfg: Dict) -> Dict:
    """XLM-style sizing (reference: fairseq/models/roberta/model.py:517-524)."""
    d = dict(cfg)
    d.setdefault("embed_dim", 1280)
    d.setdefault("ffn_dim", 1280 * 4)
    d.setdefault("layers", 16)
    d.setdefault("heads", 16)
    return d


# the reference registers camembert/xlmr as *model* names too
# (model_camembert.py:15, model_xlmr.py:15) so task configs naming them as
# models resolve here as well
register_model("camembert")(build_masked_lm)
register_model("xlmr")(build_masked_lm)


@register_model_architecture("masked_lm", "masked_lm")
def masked_lm_base(cfg: Dict) -> Dict:
    """Base preset (reference: fairseq/models/masked_lm.py:313-341)."""
    d = dict(cfg)
    d.setdefault("embed_dim", 1024)
    d.setdefault("ffn_dim", 4096)
    d.setdefault("layers", 6)
    d.setdefault("heads", 8)
    return d


# ---------------------------------------------------------------------------
# reference arch-name parity (fairseq/models/masked_lm.py:344-403)


@register_model_architecture("masked_lm", "bert_base")
def bert_base(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("embed_dim", 768)
    d.setdefault("ffn_dim", 3072)
    d.setdefault("layers", 12)
    d.setdefault("heads", 12)
    d.setdefault("activation", "gelu")
    d.setdefault("sentence_class_num", 2)  # NSP head (ref --sent-loss)
    return d


@register_model_architecture("masked_lm", "bert_large")
def bert_large(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("embed_dim", 1024)
    d.setdefault("ffn_dim", 4096)
    d.setdefault("layers", 24)
    d.setdefault("heads", 16)
    return bert_base(d)


@register_model_architecture("masked_lm", "xlm_base")
def xlm_base(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("embed_dim", 1024)
    d.setdefault("ffn_dim", 4096)
    d.setdefault("layers", 6)
    d.setdefault("heads", 8)
    d.setdefault("activation", "gelu")
    d.setdefault("sentence_class_num", 0)  # no NSP (ref sent_loss=False)
    return d
