"""BART: denoising sequence-to-sequence pretraining model surface.

reference: fairseq/models/bart/model.py — a TransformerModel with learned
positions, embedding layernorm, shared embeddings, GELU, and classification
heads for sentence prediction. The seq2seq trunk reuses this framework's
TransformerModel (learned_pos/layernorm_embedding options); the
classification head pools the final decoder state at the eos token
(reference: model.py BARTClassificationHead + extract_features usage).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.registry import register_model, register_model_architecture
from .transformer_mt import TransformerMTConfig, TransformerModel

Dtype = Any


@dataclass(frozen=True)
class BARTConfig(TransformerMTConfig):
    num_classes: int = 0  # >0: sentence-prediction head
    pooler_dropout: float = 0.0
    eos_idx: int = 2


class BARTModel(nn.Module):
    cfg: BARTConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        mt_cfg = TransformerMTConfig(
            **{f.name: getattr(self.cfg, f.name)
               for f in dataclasses.fields(TransformerMTConfig)}
        )
        self.backbone = TransformerModel(
            mt_cfg, dtype=self.dtype, param_dtype=self.param_dtype, name="backbone"
        )
        if self.cfg.num_classes > 0:
            common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
            self.classification_dense = nn.Dense(
                self.cfg.decoder_embed_dim, name="classification_dense", **common
            )
            self.classification_out = nn.Dense(
                self.cfg.num_classes, name="classification_out", **common
            )
            self.pooler_dropout_layer = nn.Dropout(self.cfg.pooler_dropout)

    # seq2seq surface (denoising pretraining / generation fine-tune)
    def __call__(self, src_tokens, prev_output_tokens, deterministic: bool = True):
        return self.backbone(src_tokens, prev_output_tokens, deterministic)

    def encode_text(self, src_tokens, deterministic: bool = True):
        return self.backbone.encode(src_tokens, deterministic)

    def forward_text_with_internal(self, src_tokens, prev_output_tokens,
                                   deterministic: bool = True):
        return self.backbone.forward_text_with_internal(
            src_tokens, prev_output_tokens, deterministic
        )

    @property
    def decoder(self):
        return self.backbone.decoder

    def init_everything(self, src_tokens, prev_output_tokens):
        """Init hook touching the seq2seq trunk AND the classification head
        (flax materializes only traversed params)."""
        logits = self(src_tokens, prev_output_tokens)
        if self.cfg.num_classes > 0:
            self.classify(src_tokens, prev_output_tokens)
        return logits

    def classify(self, src_tokens, prev_output_tokens, deterministic: bool = True):
        """Sentence prediction: decoder features pooled at the eos position
        (reference: bart/model.py — 'sentence representation' = eos state)."""
        enc, enc_mask = self.backbone.encode(src_tokens, deterministic)
        feats = self.backbone.decoder(
            prev_output_tokens, enc, enc_mask,
            deterministic=deterministic, features_only=True,
        )
        is_eos = (prev_output_tokens == self.cfg.eos_idx).astype(feats.dtype)
        denom = jnp.maximum(jnp.sum(is_eos, axis=1, keepdims=True), 1.0)
        pooled = jnp.einsum("btc,bt->bc", feats, is_eos / denom)
        x = self.pooler_dropout_layer(pooled, deterministic=deterministic)
        x = jnp.tanh(self.classification_dense(x))
        x = self.pooler_dropout_layer(x, deterministic=deterministic)
        return self.classification_out(x).astype(jnp.float32)


@register_model("bart")
def build_bart(cfg_dict: Dict, dtype=jnp.float32, param_dtype=jnp.float32):
    known = {f.name for f in dataclasses.fields(BARTConfig)}
    cfg = BARTConfig(**{k: v for k, v in cfg_dict.items() if k in known})
    return BARTModel(cfg, dtype=dtype, param_dtype=param_dtype)


def _bart_common(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("learned_pos", True)
    d.setdefault("layernorm_embedding", True)
    d.setdefault("share_all_embeddings", True)
    d.setdefault("share_decoder_input_output_embed", True)
    d.setdefault("activation", "gelu")
    d.setdefault("encoder_normalize_before", False)
    d.setdefault("decoder_normalize_before", False)
    return d


@register_model_architecture("bart", "bart_base")
def bart_base(cfg: Dict) -> Dict:
    d = _bart_common(cfg)
    d.setdefault("encoder_embed_dim", 768)
    d.setdefault("encoder_ffn_dim", 3072)
    d.setdefault("encoder_layers", 6)
    d.setdefault("encoder_heads", 12)
    d.setdefault("decoder_embed_dim", 768)
    d.setdefault("decoder_ffn_dim", 3072)
    d.setdefault("decoder_layers", 6)
    d.setdefault("decoder_heads", 12)
    return d


@register_model_architecture("bart", "bart_large")
def bart_large(cfg: Dict) -> Dict:
    d = _bart_common(cfg)
    d.setdefault("encoder_embed_dim", 1024)
    d.setdefault("encoder_ffn_dim", 4096)
    d.setdefault("encoder_layers", 12)
    d.setdefault("encoder_heads", 16)
    d.setdefault("decoder_embed_dim", 1024)
    d.setdefault("decoder_ffn_dim", 4096)
    d.setdefault("decoder_layers", 12)
    d.setdefault("decoder_heads", 16)
    return d


# ---------------------------------------------------------------------------
# reference arch-name parity (fairseq/models/bart/model.py:356-370)


@register_model_architecture("bart", "mbart_base")
def mbart_base(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("no_scale_embedding", False)
    return bart_base(d)


@register_model_architecture("bart", "mbart_large")
def mbart_large(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("no_scale_embedding", False)
    return bart_large(d)


@register_model_architecture("bart", "mbart_base_wmt20")
def mbart_base_wmt20(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("layernorm_embedding", False)
    return mbart_base(d)
