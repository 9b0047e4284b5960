"""Multilingual transformer: per-language-pair models with component sharing.

reference: fairseq/models/multilingual_transformer.py — one encoder per
SOURCE language and one decoder per TARGET language (so pairs sharing a side
share the module), with --share-encoders / --share-decoders /
--share-all-embeddings collapsing further. In flax, sharing is simply module
reuse: the same sub-module instance appears under one param subtree and every
pair routes through it (the reference swaps nn.Module references; here the
pytree IS the sharing)."""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.registry import register_model, register_model_architecture
from .transformer_mt import TransformerMTConfig, TransformerModel

Dtype = Any


@dataclass(frozen=True)
class MultilingualConfig(TransformerMTConfig):
    lang_pairs: Tuple[str, ...] = ("de-en",)
    share_encoders: bool = False
    share_decoders: bool = False


class MultilingualTransformer(nn.Module):
    cfg: MultilingualConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        mt_cfg = TransformerMTConfig(
            **{f.name: getattr(c, f.name)
               for f in dataclasses.fields(TransformerMTConfig)}
        )
        src_langs = sorted({p.split("-")[0] for p in c.lang_pairs})
        tgt_langs = sorted({p.split("-")[1] for p in c.lang_pairs})
        if c.share_encoders:
            src_langs = ["shared"]
        if c.share_decoders:
            tgt_langs = ["shared"]
        # one full TransformerModel per (enc-group, dec-group); the encoder
        # half is keyed by source lang and the decoder half by target lang
        # via module reuse below
        self._src_key = {
            p: ("shared" if c.share_encoders else p.split("-")[0])
            for p in c.lang_pairs
        }
        self._tgt_key = {
            p: ("shared" if c.share_decoders else p.split("-")[1])
            for p in c.lang_pairs
        }
        self.encoders = {
            s: TransformerModel(
                mt_cfg, dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"enc_{s}",
            )
            for s in src_langs
        }
        from .transformer_decoder import TransformerDecoder

        self.decoders = {
            t: TransformerDecoder(
                vocab_size=c.tgt_vocab_size,
                embed_dim=c.decoder_embed_dim,
                ffn_dim=c.decoder_ffn_dim,
                num_layers=c.decoder_layers,
                num_heads=c.decoder_heads,
                dropout=c.dropout,
                normalize_before=c.decoder_normalize_before,
                padding_idx=c.padding_idx,
                share_input_output_embed=c.share_decoder_input_output_embed,
                max_target_positions=c.max_target_positions,
                name=f"dec_{t}",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )
            for t in tgt_langs
        }

    def encode_pair(self, pair: str, src_tokens, deterministic: bool = True):
        return self.encoders[self._src_key[pair]].encode(src_tokens, deterministic)

    def forward_pair(self, pair: str, src_tokens, prev_output_tokens,
                     deterministic: bool = True):
        enc, enc_mask = self.encode_pair(pair, src_tokens, deterministic)
        return self.decoders[self._tgt_key[pair]](
            prev_output_tokens, enc, enc_mask, deterministic=deterministic
        )

    def __call__(self, src_tokens, prev_output_tokens, pair: str = None,
                 deterministic: bool = True):
        pair = pair or self.cfg.lang_pairs[0]
        return self.forward_pair(pair, src_tokens, prev_output_tokens,
                                 deterministic)

    def init_everything(self, src_tokens, prev_output_tokens):
        """Touch every pair so all param subtrees exist."""
        outs = []
        for pair in self.cfg.lang_pairs:
            outs.append(self.forward_pair(pair, src_tokens, prev_output_tokens))
        return outs[0]


@register_model("multilingual_transformer")
def build_multilingual(cfg_dict: Dict, dtype=jnp.float32, param_dtype=jnp.float32):
    known = {f.name for f in dataclasses.fields(MultilingualConfig)}
    kw = {k: v for k, v in cfg_dict.items() if k in known}
    if "lang_pairs" in kw:
        lp = kw["lang_pairs"]
        kw["lang_pairs"] = tuple(lp.split(",") if isinstance(lp, str) else lp)
    cfg = MultilingualConfig(**kw)
    return MultilingualTransformer(cfg, dtype=dtype, param_dtype=param_dtype)


@register_model_architecture("multilingual_transformer", "multilingual_transformer")
def multilingual_base(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("encoder_embed_dim", 512)
    d.setdefault("encoder_ffn_dim", 2048)
    d.setdefault("encoder_layers", 6)
    d.setdefault("encoder_heads", 8)
    d.setdefault("decoder_embed_dim", 512)
    d.setdefault("decoder_ffn_dim", 2048)
    d.setdefault("decoder_layers", 6)
    d.setdefault("decoder_heads", 8)
    return d


@register_model_architecture(
    "multilingual_transformer", "multilingual_transformer_iwslt_de_en"
)
def multilingual_iwslt(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("encoder_embed_dim", 512)
    d.setdefault("encoder_ffn_dim", 1024)
    d.setdefault("encoder_layers", 6)
    d.setdefault("encoder_heads", 4)
    d.setdefault("decoder_embed_dim", 512)
    d.setdefault("decoder_ffn_dim", 1024)
    d.setdefault("decoder_layers", 6)
    d.setdefault("decoder_heads", 4)
    return d
